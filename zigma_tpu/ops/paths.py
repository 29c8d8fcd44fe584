"""Space-filling-curve scan-path generators.

Each path is a permutation of token indices of an N x N patch grid.  At model
build time the per-layer permutation (and its inverse) is baked into the
compiled graph as a static ``jnp.int32`` gather-index constant, so under
``jit`` the token reordering compiles to a single fused gather — effectively
free on TPU compared to the reference's eager ``tensor[:, :, perm]`` indexing
(reference: utils/utils_zigzag.py, utils/utils_gilbert.py).

Conventions (kept bit-identical to the reference for checkpoint parity):

- ``zigzag_path(N)`` returns 8 orderings where ``path[s]`` is the (row-major)
  token index visited at scan step ``s``  (reference: utils_zigzag.py:144-175).
- ``hilbert_path(N)`` returns 8 orderings derived from the generalized-Hilbert
  ("gilbert") curve.  NOTE the reference flattens the *curve-index matrix*, so
  these arrays follow the inverse convention: ``path[cell] = scan step of that
  cell``  (reference: utils_zigzag.py:123-131,285-302).  Both conventions are
  valid permutations and each is paired with its own inverse at use sites, so
  we reproduce the reference behaviour exactly rather than "fixing" it.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "zigzag_path",
    "hilbert_path",
    "gilbert_order",
    "random_paths",
    "reverse_permutation",
    "video_time_paths",
    "build_layer_paths",
]


def reverse_permutation(perm: np.ndarray) -> np.ndarray:
    """Inverse permutation: out[perm[i]] = i  (reference: utils_zigzag.py:136-141)."""
    perm = np.asarray(perm)
    out = np.empty_like(perm)
    out[perm] = np.arange(perm.shape[0], dtype=perm.dtype)
    return out


# ---------------------------------------------------------------------------
# Zigzag (boustrophedon) orderings
# ---------------------------------------------------------------------------


def _zigzag_rowmajor(N: int, start_row: int, start_col: int, dr: int, dc: int) -> np.ndarray:
    """Serpentine row-major walk from a given corner/direction, vectorized."""
    i = np.arange(N)[:, None]  # outer (row counter)
    j = np.arange(N)[None, :]  # inner (col counter)
    col = np.where(i % 2 == 0, j, N - 1 - j)
    flat = (start_row + dr * i) * N + start_col + dc * col
    return flat.reshape(-1).astype(np.int64)


def _zigzag_colmajor(N: int, start_row: int, start_col: int, dr: int, dc: int) -> np.ndarray:
    """Serpentine column-major walk from a given corner/direction, vectorized."""
    j = np.arange(N)[:, None]  # outer (col counter)
    i = np.arange(N)[None, :]  # inner (row counter)
    row = np.where(j % 2 == 0, i, N - 1 - i)
    flat = (start_row + dr * row) * N + start_col + dc * j
    return flat.reshape(-1).astype(np.int64)


_ZIGZAG_CORNERS = (
    (0, 0, 1, 1),  # top-left, forward
    (0, -1, 1, -1),  # top-right, mirrored cols
    (-1, 0, -1, 1),  # bottom-left, mirrored rows
    (-1, -1, -1, -1),  # bottom-right, both mirrored
)


def zigzag_path(N: int) -> list[np.ndarray]:
    """The 8 zigzag orderings of an N x N grid: {row-major, col-major} x 4
    corner/direction combos, in the reference's order
    (reference: utils_zigzag.py:144-175)."""
    paths = []
    for sr, sc, dr, dc in _ZIGZAG_CORNERS:
        sr_, sc_ = (N - 1 if sr == -1 else 0), (N - 1 if sc == -1 else 0)
        paths.append(_zigzag_rowmajor(N, sr_, sc_, dr, dc))
        paths.append(_zigzag_colmajor(N, sr_, sc_, dr, dc))
    return paths


# ---------------------------------------------------------------------------
# Generalized Hilbert ("gilbert") curve
# ---------------------------------------------------------------------------
# Generative form of the public gilbert algorithm (jakubcerveny/gilbert,
# BSD-2-Clause): walk the curve once, emitting grid coordinates in visit
# order.  O(N^2) total instead of the reference's O(N^2 log N) per-point
# queries (reference: utils_zigzag.py:16-131).


def _sgn(v: int) -> int:
    return (v > 0) - (v < 0)


def _gilbert_walk(x, y, ax, ay, bx, by):
    w, h = abs(ax + ay), abs(bx + by)
    dax, day = _sgn(ax), _sgn(ay)  # unit major direction
    dbx, dby = _sgn(bx), _sgn(by)  # unit orthogonal direction

    if h == 1:  # single row: march along the major axis
        for _ in range(w):
            yield x, y
            x, y = x + dax, y + day
        return
    if w == 1:  # single column: march along the orthogonal axis
        for _ in range(h):
            yield x, y
            x, y = x + dbx, y + dby
        return

    ax2, ay2 = ax // 2, ay // 2
    bx2, by2 = bx // 2, by // 2
    w2, h2 = abs(ax2 + ay2), abs(bx2 + by2)

    if 2 * w > 3 * h:
        if (w2 % 2) and (w > 2):
            ax2, ay2 = ax2 + dax, ay2 + day  # prefer even steps
        # long case: split into two halves along the major axis
        yield from _gilbert_walk(x, y, ax2, ay2, bx, by)
        yield from _gilbert_walk(x + ax2, y + ay2, ax - ax2, ay - ay2, bx, by)
    else:
        if (h2 % 2) and (h > 2):
            bx2, by2 = bx2 + dbx, by2 + dby
        # standard case: one step up, one long horizontal, one step down
        yield from _gilbert_walk(x, y, bx2, by2, ax2, ay2)
        yield from _gilbert_walk(x + bx2, y + by2, ax, ay, bx - bx2, by - by2)
        yield from _gilbert_walk(
            x + (ax - dax) + (bx2 - dbx),
            y + (ay - day) + (by2 - dby),
            -bx2,
            -by2,
            -(ax - ax2),
            -(ay - ay2),
        )


def gilbert_order(width: int, height: int) -> np.ndarray:
    """Curve-index matrix M with M[x, y] = scan step of cell (x, y)."""
    order = np.empty((width, height), dtype=np.int64)
    if width >= height:
        walk = _gilbert_walk(0, 0, width, 0, 0, height)
    else:
        walk = _gilbert_walk(0, 0, 0, height, width, 0)
    for step, (px, py) in enumerate(walk):
        order[px, py] = step
    return order


def hilbert_path(N: int) -> list[np.ndarray]:
    """8 gilbert orderings: base curve-index matrix plus transpose/rot90
    variants, flattened, in the reference's order
    (reference: utils_zigzag.py:285-302)."""
    base = gilbert_order(N, N)
    mats = []
    for k in range(4):
        rot = np.rot90(base, k) if k else base
        mats.append(rot)
        mats.append(rot.T)
    return [m.reshape(-1).copy() for m in mats]


# ---------------------------------------------------------------------------
# Random and temporal orderings
# ---------------------------------------------------------------------------


def random_paths(N: int, num: int, seed: int = 0) -> list[np.ndarray]:
    """``num`` random permutations of the N x N grid.  Unlike the reference
    (which shuffles via global numpy state, model_zigma.py:719-726) this takes
    an explicit seed so runs are reproducible and identical across hosts."""
    rng = np.random.default_rng(seed)
    return [rng.permutation(N * N).astype(np.int64) for _ in range(num)]


def video_time_paths(T: int) -> tuple[np.ndarray, np.ndarray]:
    """Forward / reversed frame orderings for temporal video layers
    (reference: model_zigma.py:765-771)."""
    fwd = np.arange(T, dtype=np.int64)
    return fwd, fwd[::-1].copy()


# ---------------------------------------------------------------------------
# Per-layer scan tables
# ---------------------------------------------------------------------------


def build_layer_paths(
    scan_type: str,
    depth: int,
    patch_side: int,
    video_frames: int = 0,
    seed: int = 0,
):
    """Construct the per-layer permutation tables for a ZigMa stack.

    Returns ``(paths, paths_rev, st_order)`` where ``paths[i]`` is the
    permutation applied before layer ``i``'s scan and ``paths_rev[i]`` its
    inverse.  ``st_order`` is None for image models, or a length-``depth``
    string of 's'/'t' for factorized video models.

    Mirrors the scan-table construction in the reference model
    (reference: model_zigma.py:689-794):

    - ``zigzagN{k}`` / ``hilbertN{k}`` / ``randomN{k}``: layer i uses path
      ``i mod k``.
    - ``zzvideo_{pattern}`` (a.k.a. the reference's ``video_*`` runtime path):
      the 's'/'t' pattern is tiled over depth; the j-th spatial layer uses
      zigzag path ``j mod 8``; the j-th temporal layer alternates
      forward/backward frame order.
    - ``v1`` / ``v2`` / ``parallelN{k}``: no per-layer permutation (returns
      identity-free tables: ``None`` entries).
    """
    if scan_type in ("v1", "v2"):
        return [None] * depth, [None] * depth, None

    if scan_type.startswith("parallelN"):
        # every layer runs N parallel branches, each with ITS OWN path
        # (handled inside the mixer via parallel_perms, built by
        # parallel_scan_perms below) — no additional per-layer outer
        # permutation
        return [None] * depth, [None] * depth, None

    if scan_type.startswith(("zigzagN", "hilbertN", "randomN")):
        if scan_type.startswith("zigzagN"):
            k = int(scan_type[len("zigzagN"):])
            base = zigzag_path(patch_side)[:k]
        elif scan_type.startswith("hilbertN"):
            k = int(scan_type[len("hilbertN"):])
            base = hilbert_path(patch_side)[:k]
        else:
            k = int(scan_type[len("randomN"):])
            base = random_paths(patch_side, k, seed=seed)
        if len(base) == 0:
            raise ValueError(f"scan_type {scan_type!r} selects zero paths")
        base_rev = [reverse_permutation(p) for p in base]
        paths = [base[i % len(base)] for i in range(depth)]
        paths_rev = [base_rev[i % len(base)] for i in range(depth)]
        return paths, paths_rev, None

    if scan_type.startswith("zzvideo_") or scan_type.startswith("video_"):
        pattern = scan_type.split("_", 1)[1]
        if not pattern or set(pattern) - {"s", "t"}:
            raise ValueError(f"video scan pattern must be 's'/'t', got {pattern!r}")
        if video_frames <= 0:
            raise ValueError("video scan types require video_frames > 0")
        st_order = (pattern * depth)[:depth]
        spatial = zigzag_path(patch_side)
        spatial_rev = [reverse_permutation(p) for p in spatial]
        t_fwd, t_bwd = video_time_paths(video_frames)
        paths, paths_rev = [], []
        n_s = n_t = 0
        for ch in st_order:
            if ch == "s":
                paths.append(spatial[n_s % 8])
                paths_rev.append(spatial_rev[n_s % 8])
                n_s += 1
            else:
                # Temporal layers alternate forward/backward frame order.
                # QUIRK kept for checkpoint parity: the reference pairs the
                # forward path with the *reversed* path as its "inverse"
                # (model_zigma.py:771-772), so every temporal layer's mixer
                # output is emitted in flipped frame order rather than being
                # un-permuted.  True inverses would be (fwd, fwd)/(bwd, bwd).
                paths.append(t_fwd if n_t % 2 == 0 else t_bwd)
                paths_rev.append(t_bwd if n_t % 2 == 0 else t_fwd)
                n_t += 1
        return paths, paths_rev, st_order

    raise ValueError(f"unknown scan_type: {scan_type!r}")


def parallel_scan_perms(scan_type: str, patch_side: int) -> tuple:
    """(perm, perm_rev) pairs for a ``parallelN{k}`` mixer's k simultaneous
    branches — branch i scans zigzag path ``i mod 8``.

    The single construction point for parallelN path knowledge (paired with
    build_layer_paths' per-layer None tables above): the model passes these
    to ``Mamba(parallel_perms=...)``.
    """
    k = int(scan_type[len("parallelN"):])
    base = zigzag_path(patch_side)
    return tuple((base[i % 8], reverse_permutation(base[i % 8]))
                 for i in range(k))
