"""Training driver: ``python -m zigma_tpu.cli.train model=... data=... [k=v ...]``

TPU-native rebuild of the reference trainer (reference: train_acc.py:112-654):
one pjit-sharded train step over a ('data', 'model') mesh replaces
Accelerate/DDP; orbax checkpoints replace torch.save; JSONL (+optional
wandb) replaces wandb-only logging.

Step semantics preserved: latent scale 0.18215 (train_acc.py:432-435),
AdamW lr 1e-4 wd 0, EMA 0.9999, grad-clip 2.0 (applied BEFORE the step —
the reference clips after opt.step(), a no-op quirk, train_acc.py:445-447),
velocity flow-matching loss, periodic vis sampling with the EMA weights and
try/except degradation so training survives sampler blowups
(train_acc.py:550-554).
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from zigma_tpu.config import Config, load_config
from zigma_tpu.models import ZigMa
from zigma_tpu.parallel import make_mesh, shard_batch, shard_train_state
from zigma_tpu.train import (
    LATENT_SCALE,
    TrainState,
    create_chained_train_step,
    create_optimizer,
    create_train_step,
    latest_checkpoint,
    make_diffusion_loss_fn,
    restore_checkpoint,
    save_checkpoint,
)
from zigma_tpu.transport import Sampler, create_transport
from zigma_tpu.utils.logging_utils import (
    MetricLogger,
    array_to_image_grid,
    create_logger,
    write_video_grid,
)

DEFAULT_CONFIG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "configs")


def build_model(cfg: Config) -> ZigMa:
    """Model from config; conditioning flags come from the data group like
    the reference's get_model (utils/train_utils.py:41-56)."""
    params = dict(cfg.model.params)
    data = cfg.data
    if data.get("has_text"):
        params.setdefault("has_text", True)
        params.setdefault("d_context", data.get("d_context", 768))
        params.setdefault("n_context_token", data.get("n_context_token", 77))
    if data.get("num_classes", -1) > 0:
        params.setdefault("num_classes", data["num_classes"])
    if data.get("video_frames", 0) > 0:
        params.setdefault("video_frames", data["video_frames"])
    if cfg.get("mixed_precision") == "bf16":
        params.setdefault("dtype", jnp.bfloat16)
    return ZigMa(**params)


def synthetic_batches(cfg: Config, model: ZigMa, seed: int = 0):
    """Random latent batches matching the model's input shape — smoke/bench
    path with no reference equivalent (the reference requires real shards)."""
    rng = np.random.default_rng(seed)
    data = cfg.data
    bs = data["batch_size"]
    p = cfg.model.params
    shape = (bs, p["in_channels"], p["img_dim"], p["img_dim"])
    if data.get("video_frames", 0) > 0:
        shape = (bs, data["video_frames"], *shape[1:])
    while True:
        batch = {"x": rng.normal(size=shape).astype(np.float32)}
        if data.get("num_classes", -1) > 0:
            batch["y"] = rng.integers(0, data["num_classes"], (bs,))
        elif data.get("has_text"):
            batch["y"] = rng.normal(
                size=(bs, data.get("n_context_token", 77),
                      data.get("d_context", 768))).astype(np.float32)
        yield batch


def wds_batches(cfg: Config, model: ZigMa, split: str = "train"):
    """Real tar-shard pipeline; key selection per dataset family mirrors
    train_acc.py:287-396 get_data_generator.

    split: "train" (infinite, shuffled) or "validation" (one finite pass) —
    eval consumers (sample CLI metrics / likelihood) must score the
    validation split, not a resample of the training stream.
    """
    from zigma_tpu.data import WebDataModuleFromConfig
    from zigma_tpu.config import config_to_dict

    data = config_to_dict(cfg.data)
    dm_keys = ("tar_base", "batch_size", "image_size", "train", "validation",
               "multinode", "is_video", "video_frames", "val_batch_size")
    dm = WebDataModuleFromConfig(**{k: data[k] for k in dm_keys if k in data})
    if split == "validation":
        loader = dm.val_dataloader()
    elif split == "train":
        loader = dm.train_dataloader()
    else:
        raise ValueError(f"unknown split {split!r}")
    video = data.get("video_frames", 0) > 0
    rng = np.random.default_rng(jax.process_index())
    n_frames = int(data.get("video_frames", 0))
    for raw in loader:
        if video:
            x = np.asarray(raw["frame_feature256"])
            if x.shape[1] > n_frames:
                # stored clips longer than the model window: random temporal
                # crop per batch (the reference's celebav family,
                # train_acc.py:309-317)
                start = int(rng.integers(0, x.shape[1] - n_frames + 1))
                x = x[:, start:start + n_frames]
            batch = {"x": x}
            if "cls_id" in raw:
                batch["y"] = raw["cls_id"]
        else:
            x = raw.get("latent", raw.get("img_feature"))
            batch = {"x": x}
            if "cls_id" in raw:  # class-conditional image data (beyond the
                batch["y"] = raw["cls_id"]  # reference's video-only cls_id)
            elif "caption_feature" in raw:
                y = np.asarray(raw["caption_feature"])
                if y.ndim == 4:  # (B, n_captions, 77, d): pick one per image
                    # (the reference's random caption pick, train_acc.py:297-302)
                    idx = rng.integers(0, y.shape[1], y.shape[0])
                    y = y[np.arange(y.shape[0]), idx]
                batch["y"] = y
        yield batch


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    config_dir = DEFAULT_CONFIG_DIR
    if argv and argv[0].startswith("--config-dir="):
        config_dir = argv.pop(0).split("=", 1)[1]
    cfg = load_config(config_dir, "default", argv)

    if os.environ.get("ZIGMA_DISTRIBUTED"):
        jax.distributed.initialize()

    run_dir = os.path.join(
        cfg.get("results_dir", "outputs"),
        f"{cfg.model.get('name', 'model')}_{cfg.data.get('name', 'data')}")
    logger = create_logger(run_dir)
    mlog = MetricLogger(run_dir, use_wandb=bool(cfg.get("use_wandb")))
    logger.info("config: %s", dict(cfg))

    seed = int(cfg.get("global_seed", 0)) + jax.process_index()
    rng = jax.random.PRNGKey(seed)

    model = build_model(cfg)
    transport = create_transport(
        cfg.train.get("path_type", "Linear"),
        cfg.train.get("prediction", "velocity"),
        cfg.train.get("loss_weight"),
        cfg.train.get("train_eps"), cfg.train.get("sample_eps"))
    optimizer = create_optimizer(
        lr=float(cfg.optim.get("lr", 1e-4)),
        weight_decay=float(cfg.optim.get("wd", 0.0)),
        grad_clip=float(cfg.get("max_grad_norm", 2.0)))

    # init params from one example batch
    gen = (synthetic_batches(cfg, model, seed) if cfg.data.get("synthetic")
           else wds_batches(cfg, model))
    example = next(gen)
    rng, k_init = jax.random.split(rng)
    params = model.init(k_init, jnp.asarray(example["x"]),
                        jnp.zeros((example["x"].shape[0],)),
                        jnp.asarray(example["y"]) if "y" in example else None)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    logger.info("parameters: %.2fM", n_params / 1e6)

    # mesh + state placement: pure DP replication by default (reference
    # parity); parallel.tp adds a tensor-parallel axis, parallel.fsdp
    # shards params/EMA/optimizer moments over 'data' (ZeRO-3 semantics,
    # parallel/mesh.py) — the train step itself is identical either way
    par = cfg.get("parallel") or {}
    fsdp = bool(par.get("fsdp"))
    _fm = par.get("fsdp_min_size")
    fsdp_min = 65536 if _fm is None else int(_fm)  # 0 = shard everything
    tp = int(par.get("tp", 1) or 1)
    pp = int(par.get("pp", 1) or 1)
    if tp > 1 and pp > 1:
        raise ValueError("parallel.tp and parallel.pp cannot be combined "
                         "(yet): tensor-parallel shardings are invisible "
                         "inside the pipeline's shard_map")
    mesh = make_mesh(model=tp, pipe=pp)
    if fsdp or tp > 1 or pp > 1:
        logger.info("mesh %s, fsdp=%s", dict(mesh.shape), fsdp)

    def place(s):
        return shard_train_state(s, mesh, fsdp=fsdp, fsdp_min_size=fsdp_min)

    state = place(TrainState.create(params, optimizer))
    del params

    ckpt_dir = os.path.join(run_dir, "checkpoints")
    resume = cfg.get("ckpt") or latest_checkpoint(ckpt_dir)
    if resume:
        logger.info("resuming from %s", resume)
        # restore straight into the placed state's shardings (no host
        # round-trip: an FSDP/PP state sharded across processes has
        # non-addressable shards, so device_get would crash multi-host)
        state = restore_checkpoint(resume, state)

    latent_scale = LATENT_SCALE if cfg.get("is_latent", True) else None
    apply_fn = None
    if pp > 1:
        # pipeline-parallel training: the loss substitutes the pipelined
        # forward (parallel/pipeline.py) for model.apply; grads/optimizer/
        # EMA are unchanged, and stage weights stay put via the state
        # shardings (train_state_sharding's 'pipe' rule)
        from zigma_tpu.parallel import zigma_pipelined_apply

        n_mb = int(par.get("pp_microbatches", 0) or 0) or None

        def apply_fn(params, xt, t, y=None, train=False, rngs=None, **kw):
            return zigma_pipelined_apply(
                model, params, xt, t, y, mesh=mesh, train=train, rngs=rngs,
                n_microbatches=n_mb, **kw)

    loss_fn = make_diffusion_loss_fn(model, transport,
                                     latent_scale=latent_scale,
                                     apply_fn=apply_fn)
    ema_rate = float(cfg.get("ema_rate", 0.9999))
    # chain_steps > 1: N optimizer steps per dispatch via one jitted
    # lax.scan — harvests the measured ~10% per-dispatch overhead of
    # returning the state pytree through the runtime relay
    # (train/state.py create_chained_train_step; docs/DESIGN.md §8).
    # Same step body as the plain path; periodic actions (log/ckpt/vis/
    # eval) fire at the first chain boundary at-or-after their cadence.
    chain = int(cfg.get("chain_steps", 1))
    if chain < 1:
        raise ValueError(f"chain_steps must be >= 1, got {chain}")
    step_fn = create_train_step(loss_fn, optimizer, ema_decay=ema_rate)
    chain_fn = (create_chained_train_step(loss_fn, optimizer,
                                          ema_decay=ema_rate, n_steps=chain)
                if chain > 1 else None)

    sampler = Sampler(transport)
    # in-training sampling (vis + eval-on-the-fly) honors the ode config
    # group, euler-50 when unset.  NOTE: the reference's own in-training
    # eval ignores its ode group — train_acc.py:531 calls sample_ode()
    # with the dopri5 defaults; applying the config is the evidently
    # intended behavior (and remains overridable with ode.* keys).
    ode_cfg = cfg.get("ode") or {}
    vis_method = ode_cfg.get("sampling_method", "euler")
    vis_steps = int(ode_cfg.get("num_sampling_steps", 50))
    _vis = sampler.sample_ode(
        sampling_method=vis_method, num_steps=vis_steps,
        atol=float(ode_cfg.get("atol", 1e-6)),
        rtol=float(ode_cfg.get("rtol", 1e-3)))
    logger.info("in-training sampler: %s-%d", vis_method, vis_steps)

    # jit with ema_params as an ARGUMENT (closing over params embeds them
    # as HLO constants: huge compile payloads + recompile per new weights)
    @jax.jit
    def vis_fn(ema_params, z, y=None):
        return _vis(z, lambda xx, tt: model.apply(ema_params, xx, tt, y))[-1]

    train_steps = int(cfg.data.get("train_steps", 100))
    log_every = int(cfg.get("log_every", 100))
    ckpt_every = int(cfg.get("ckpt_every", 50_000))
    sample_every = int(cfg.get("sample_every", 10_000))
    fid_every = int(cfg.data.get("sample_fid_every", 0) or 0)
    fid_n = int(cfg.data.get("sample_fid_n", 0) or 0)
    if fid_n and fid_every:
        # fail fast on a typo'd eval_metrics / fvd-on-image config NOW,
        # not at the first eval boundary thousands of steps in
        from zigma_tpu.metrics.menu import validate_choices

        validate_choices(
            cfg.data.get("eval_metrics") or cfg.get("eval_metrics"),
            video=cfg.data.get("video_frames", 0) > 0)

    fid_state = {}  # metric/codec built ONCE, reused (reset) per eval

    def fid_eval(state, rng):
        """Eval-on-the-fly with the EMA weights (train_acc.py:507-646):
        sample, VAE-decode when a codec is available, convert to the uint8
        metric contract, update the reference's FULL in-training menu —
        fid/is/kid/prdc/sfid/fdd for images, fid+fvd for video
        (train_acc.py:398-405).  Each choice degrades independently
        (metrics/menu.py): fid-family falls to weight-free patch stats,
        net-defined choices drop with a warning."""
        from zigma_tpu.data import (IdentityCodec, decode_maybe_video,
                                    get_codec)
        from zigma_tpu.metrics import build_metric_suite, to_uint8_images

        if not fid_state:
            codec = get_codec(cfg.get("vae_kind", "auto"))
            # the degradation is keyed on IN_PIXELS, not on weight
            # availability alone: with cached Inception weights but no
            # VAE, raw 4-channel float latents would crash the 3-channel
            # uint8 net contracts — latents always take patch statistics
            in_pixels = not isinstance(codec, IdentityCodec)
            suite = build_metric_suite(
                choices=(cfg.data.get("eval_metrics")
                         or cfg.get("eval_metrics")),
                video=cfg.data.get("video_frames", 0) > 0,
                in_pixels=in_pixels, logger=logger)
            if suite.empty:
                raise RuntimeError(
                    "no evaluation metric survived degradation "
                    f"(requested {cfg.data.get('eval_metrics')}, "
                    f"dropped {suite.dropped})")
            logger.info("eval metrics: %s%s", suite.choices,
                        f" (dropped: {list(suite.dropped)})"
                        if suite.dropped else "")
            fid_state.update(metric=suite, codec=codec,
                             in_pixels=in_pixels)
        metric, codec = fid_state["metric"], fid_state["codec"]
        in_pixels = fid_state["in_pixels"]
        metric.reset()

        def feed(arr):
            # frame-folded VAE decode for video (the metric facade refolds
            # (b t) for FVD, my_metrics.py:58-69)
            arr = decode_maybe_video(codec, arr)
            return to_uint8_images(arr) if in_pixels else arr

        # real side: a fresh finite pass over the VALIDATION split when one
        # is configured — pulling from the live training iterator would
        # silently steal batches from the optimizer AND score FID against
        # the shuffled training stream (wds_batches' own documented rule)
        if cfg.data.get("validation") and not cfg.data.get("synthetic"):
            real_gen = iter(wds_batches(cfg, model, split="validation"))
        else:
            if "warned_train_reals" not in fid_state:
                fid_state["warned_train_reals"] = True
                logger.warning(
                    "no validation split configured: FID real batches come "
                    "from (and are consumed out of) the training stream")
            real_gen = gen

        bs = int(cfg.data.get("sample_fid_bs", 4))
        done = 0
        while done < fid_n:
            try:
                batch = next(real_gen)
            except StopIteration:
                logger.warning("validation split exhausted at %d/%d FID "
                               "samples", done, fid_n)
                break
            real = np.asarray(batch["x"])[:bs]
            rng, k = jax.random.split(rng)
            z = jax.random.normal(k, real.shape)
            y = (jnp.asarray(batch["y"][:bs]) if "y" in batch else None)
            fake = vis_fn(state.ema_params, z, y)
            if latent_scale:
                fake = fake / latent_scale
            metric.update_real(feed(real))
            metric.update_fake(feed(np.asarray(jax.device_get(fake))))
            done += real.shape[0]
        if done == 0:
            # empty validation split: compute() on zero statistics is
            # undefined (ADVICE r3) — skip instead of crashing the loop
            logger.warning("FID eval skipped: validation split yielded "
                           "no batches")
            return {}
        return metric.compute()

    # Preemption-safe shutdown (beyond parity — the reference's only
    # recovery is restart-from-last-periodic-checkpoint): SIGTERM/SIGINT
    # set a flag; the loop breaks at the next step boundary and the final
    # checkpoint below captures the current state.  On multi-host runs the
    # scheduler delivers the signal to every host, so the collective orbax
    # save still lines up.
    import signal

    stop_requested = []

    def _request_stop(signum, frame):
        del frame
        stop_requested.append(signum)

    prev_handlers = {
        s: signal.signal(s, _request_stop)
        for s in (signal.SIGTERM, signal.SIGINT)}

    logger.info("training for %d steps on mesh %s", train_steps,
                dict(mesh.shape))
    t_log = time.time()
    last_log_step = int(jax.device_get(state.step))
    # host-side step counter: reading state.step each iteration would block
    # on the async-dispatched train step and stop input I/O from overlapping
    # device compute
    step = int(jax.device_get(state.step))
    while step < train_steps:
        if stop_requested:
            logger.warning(
                "signal %s received: checkpointing and exiting at step %d",
                stop_requested[0], step)
            break
        prev_step = step
        n = min(chain, train_steps - step)
        if chain_fn is not None and n == chain:
            # N steps in one dispatch.  Keys come from the SAME host-side
            # split sequence as N plain dispatches, so chained/unchained
            # runs are bit-identical in RNG consumption (pinned by
            # tests/test_chained_train.py::TestChainedEquivalence)
            ks, batches = [], []
            for _ in range(n):
                rng, k = jax.random.split(rng)
                ks.append(k)
                batches.append(next(gen))
            stacked = jax.tree.map(lambda *xs: np.stack(xs), *batches)
            stacked = shard_batch(
                {k: jnp.asarray(v) for k, v in stacked.items()}, mesh,
                axis=1)
            state, metrics = chain_fn(state, jnp.stack(ks), stacked)
            metrics = jax.tree.map(lambda x: x[-1], metrics)
        else:  # plain path; also the sub-chain tail of a chained run
            for _ in range(n):
                batch = next(gen)
                batch = shard_batch(
                    {k: jnp.asarray(v) for k, v in batch.items()}, mesh)
                rng, k_step = jax.random.split(rng)
                state, metrics = step_fn(state, k_step, batch)
        step += n

        def crossed(every):
            # cadence check that tolerates step advancing by `chain` per
            # iteration: fires at the first boundary at-or-after each
            # multiple of `every` (== step % every == 0 when chain == 1)
            return every and (step // every) > (prev_step // every)

        if crossed(log_every):
            loss = float(jax.device_get(metrics["loss"]))
            sps = (step - last_log_step) / max(time.time() - t_log, 1e-9)
            t_log, last_log_step = time.time(), step
            logger.info("step %d  loss %.4f  steps/sec %.2f", step, loss, sps)
            mlog.log(step, loss=loss, steps_per_sec=sps,
                     grad_norm=float(jax.device_get(metrics["grad_norm"])))

        if crossed(ckpt_every):
            # ALL processes must call: orbax save is a global collective
            path = save_checkpoint(ckpt_dir, state)
            logger.info("saved checkpoint %s", path)

        if crossed(sample_every):
            try:
                rng, k_vis = jax.random.split(rng)
                z = jax.random.normal(k_vis, example["x"].shape[:1] +
                                      example["x"].shape[1:])
                y = jnp.asarray(example["y"]) if "y" in example else None
                samples = vis_fn(state.ema_params, z, y)
                if latent_scale:
                    samples = samples / latent_scale
                if jax.process_index() == 0:
                    from PIL import Image

                    arr = np.asarray(jax.device_get(samples))
                    os.makedirs(os.path.join(run_dir, "vis"), exist_ok=True)
                    if arr.ndim == 5:  # video: animated grid, every frame
                        # (the reference logs wandb.Video grids,
                        # train_acc.py:608-631)
                        vis_path = write_video_grid(
                            arr[:, :, :3],
                            os.path.join(run_dir, "vis", f"{step:07d}.gif"))
                    else:
                        grid = array_to_image_grid(arr[:, :3])
                        vis_path = os.path.join(run_dir, "vis",
                                                f"{step:07d}.png")
                        Image.fromarray(grid).save(vis_path)
                    mlog.log_media(step, vis_path)
            except Exception as e:  # train must survive sampler blowups
                logger.warning("in-training sampling failed: %s", e)

        if fid_n and crossed(fid_every):
            try:
                rng, k_fid = jax.random.split(rng)
                scores = fid_eval(state, k_fid)
                logger.info("step %d  eval %s", step, scores)
                mlog.log(step, **{f"eval/{k}": v for k, v in scores.items()})
                if scores.get("fid", float("inf")) < float(
                        jax.device_get(state.best_fid)):
                    # jnp.minimum ON the existing array keeps its (possibly
                    # multi-process-replicated) sharding — a fresh host-local
                    # jnp.asarray would put a single-device array into the
                    # mesh-replicated state and break the next train step
                    state = state.replace(best_fid=jnp.minimum(
                        state.best_fid, jnp.float32(scores["fid"])))
            except (RuntimeError, ValueError) as e:
                # RuntimeError: no feature extractor survived degradation.
                # ValueError: a metric's sample-count precondition failed
                # (e.g. prdc with a 1-sample split) — also won't fix
                # itself between intervals.  Neither may crash training:
                # the final checkpoint save below must still run.
                logger.warning("eval unavailable: %s", e)
                fid_every = 0  # don't retry every interval

    # ALL processes must call: orbax save is a global collective
    path = save_checkpoint(ckpt_dir, state)
    logger.info("final checkpoint %s", path)
    for s, h in prev_handlers.items():
        signal.signal(s, h)
    mlog.close()
    return state


if __name__ == "__main__":
    main()
