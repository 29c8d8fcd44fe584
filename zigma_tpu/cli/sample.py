"""Sampling driver: ``python -m zigma_tpu.cli.sample ckpt=... sample_mode=ODE``

TPU-native rebuild of the reference sampler (reference: sample_acc.py:34-469):
loads EMA weights (orbax checkpoint, or a reference .pt through the
converter), builds the configured ODE/SDE/likelihood sampler, generates
batches, VAE-decodes when a codec is available, writes rank-interleaved
PNGs, and optionally computes metrics against real data.
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from zigma_tpu.config import load_config
from zigma_tpu.train import LATENT_SCALE, restore_checkpoint
from zigma_tpu.transport import Sampler, create_transport
from zigma_tpu.utils.inference import cast_params_for_inference
from zigma_tpu.utils.logging_utils import create_logger
from zigma_tpu.cli.train import DEFAULT_CONFIG_DIR, build_model


def example_conditioning(cfg, batch: int):
    """Shape-correct example y for init / unconditional-CLI sampling."""
    data = cfg.data
    if data.get("has_text"):
        return jnp.zeros((batch, data.get("n_context_token", 77),
                          data.get("d_context", 768)))
    if data.get("num_classes", -1) > 0:
        return jnp.zeros((batch,), jnp.int32)
    return None


def load_params(cfg, model, example_shape):
    """EMA params from an orbax TrainState dir or a reference .pt file
    (sample_acc.py:70-79 incl. 'module.' stripping, via the converter)."""
    path = cfg.get("ckpt")
    if not path:
        raise ValueError("sampling requires ckpt=<path>")
    if path.endswith(".pt"):
        from zigma_tpu.convert import convert_reference_checkpoint

        return jax.tree.map(jnp.asarray, convert_reference_checkpoint(
            path, "ema", scan_layers=model.effective_scan_layers))
    # orbax: restore the TrainState and take the EMA tree
    from zigma_tpu.train import TrainState, create_optimizer

    x = jnp.zeros(example_shape)
    t = jnp.zeros((example_shape[0],))
    params = model.init(jax.random.PRNGKey(0), x, t,
                        example_conditioning(cfg, example_shape[0]))
    state = TrainState.create(params, create_optimizer())
    state = restore_checkpoint(path, jax.device_get(state))
    # orbax restores into the HOST-side template: device_put once here, or
    # every jitted generate call re-uploads the full parameter tree (533 MB
    # for the flagship — measured 5x sampling slowdown through the relay)
    return jax.tree.map(jnp.asarray, state.ema_params)


def build_sample_fn(cfg, sampler: Sampler):
    mode = (cfg.get("sample_mode") or "ODE").upper()
    if mode == "ODE" and cfg.get("likelihood"):
        if float(cfg.get("cfg_scale", 1.0)) != 1.0:
            # sample_acc.py:149-151: likelihood is incompatible with CFG
            raise ValueError("likelihood mode requires cfg_scale == 1")
        fn = sampler.sample_ode_likelihood(
            sampling_method=cfg.ode.get("sampling_method", "dopri5"),
            num_steps=int(cfg.ode.get("num_sampling_steps", 250)),
            atol=float(cfg.ode.get("atol", 1e-6)),
            rtol=float(cfg.ode.get("rtol", 1e-3)))
        return ("likelihood", fn)
    if mode == "ODE":
        fn = sampler.sample_ode(
            sampling_method=cfg.ode.get("sampling_method", "dopri5"),
            num_steps=int(cfg.ode.get("num_sampling_steps", 250)),
            atol=float(cfg.ode.get("atol", 1e-6)),
            rtol=float(cfg.ode.get("rtol", 1e-3)),
            reverse=bool(cfg.ode.get("reverse", False)))
        return ("ode", fn)
    if mode == "SDE":
        fn = sampler.sample_sde(
            sampling_method=cfg.sde.get("sampling_method", "Euler"),
            diffusion_form=cfg.sde.get("diffusion_form", "sigma"),
            diffusion_norm=float(cfg.sde.get("diffusion_norm", 1.0)),
            last_step=cfg.sde.get("last_step", "Mean"),
            last_step_size=float(cfg.sde.get("last_step_size", 0.04)),
            num_steps=int(cfg.sde.get("num_sampling_steps", 250)))
        return ("sde", fn)
    raise ValueError(f"unknown sample_mode {mode!r}")


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    config_dir = DEFAULT_CONFIG_DIR
    if argv and argv[0].startswith("--config-dir="):
        config_dir = argv.pop(0).split("=", 1)[1]
    cfg = load_config(config_dir, "default", argv)
    logger = create_logger(None)

    model = build_model(cfg)
    p = cfg.model.params
    bs = int(cfg.get("offline_sample_local_bs", 4))
    shape = (bs, p["in_channels"], p["img_dim"], p["img_dim"])
    if cfg.data.get("video_frames", 0) > 0:
        shape = (bs, cfg.data["video_frames"], *shape[1:])

    params = load_params(cfg, model, shape)
    if model.dtype == jnp.bfloat16:
        # hoist the per-call fp32->bf16 weight converts out of the jit
        # (~1 ms/forward on the flagship; bit-identical outputs)
        params = cast_params_for_inference(params, jnp.bfloat16)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    logger.info("loaded %.2fM params from %s", n_params / 1e6, cfg.get("ckpt"))

    transport = create_transport(
        cfg.train.get("path_type", "Linear"),
        cfg.train.get("prediction", "velocity"),
        cfg.train.get("loss_weight"),
        cfg.train.get("train_eps"), cfg.train.get("sample_eps"))
    kind, sample_fn = build_sample_fn(cfg, Sampler(transport))

    # per-process share of the global sample quota (the reference divides
    # the quota across ranks, sample_acc.py:101-111; without the division
    # every process would generate the FULL quota and the rank-interleaved
    # PNG indices would leave gaps)
    total_samples = int(cfg.get("num_fid_samples", 64))
    num = -(-total_samples // jax.process_count())
    out_dir = os.path.join(
        cfg.get("sample_dir", "samples"),
        f"{cfg.model.get('name', 'm')}_{kind}_"
        f"{(cfg.ode if kind != 'sde' else cfg.sde).get('sampling_method')}_"
        f"n{(cfg.ode if kind != 'sde' else cfg.sde).get('num_sampling_steps')}")
    os.makedirs(out_dir, exist_ok=True)

    latent_scale = LATENT_SCALE if cfg.get("is_latent", True) else None
    rank, world = jax.process_index(), jax.process_count()
    rng = jax.random.PRNGKey(int(cfg.get("global_seed", 0)) + rank)

    # conditioning + classifier-free guidance (the reference's cfg_scale is
    # vestigial/asserted ==1, sample_acc.py:150-151; ours works)
    cfg_scale = float(cfg.get("cfg_scale", 1.0))

    def _model_fn(params, y):
        # CFG needs a trained null conditioning: zeros for float features
        # (text), the null-class row for integer labels — which exists only
        # when the model trained with class_dropout_prob > 0
        if y is not None and cfg_scale != 1.0:
            from zigma_tpu.models import ZigMa

            is_float = jnp.issubdtype(jnp.asarray(y).dtype, jnp.floating)
            if not is_float and model.class_dropout_prob <= 0:
                raise ValueError(
                    "cfg_scale != 1 with integer class labels requires a "
                    "model trained with class_dropout_prob > 0 (no "
                    "null-class row exists otherwise)")
            return lambda x, t: model.apply(
                params, x, t, y, cfg_scale, method=ZigMa.forward_with_cfg)
        return lambda x, t: model.apply(params, x, t, y)

    # jit with params as an ARGUMENT: closing over them would embed the
    # whole model as HLO constants (huge compile payloads, recompiles)
    @jax.jit
    def gen_ode(params, z, y=None):
        return sample_fn(z, _model_fn(params, y))[-1]

    @jax.jit
    def gen_sde(params, ks, z, y=None):
        return sample_fn(ks, z, _model_fn(params, y))[-1]

    @jax.jit
    def gen_lik(params, ks, z, y=None):
        return sample_fn(ks, z, _model_fn(params, y))

    from PIL import Image

    # latent decode for pixel-space metrics / PNGs (sample_acc.py:365).
    # Built BEFORE the metric suite: in_pixels must key on the codec we
    # actually got, not the decode_latents flag — get_codec('auto')
    # degrades to IdentityCodec when no VAE weights are cached, and raw
    # float latents must then take the patch-statistics route instead of
    # being uint8-ified into the canonical 3-channel net contracts
    codec = None
    if cfg.get("decode_latents"):
        from zigma_tpu.data import get_codec

        codec = get_codec(cfg.get("vae_kind", "auto"))
    from zigma_tpu.data import IdentityCodec, decode_maybe_video

    in_pixels = codec is not None and not isinstance(codec, IdentityCodec)

    # optional metrics vs real data (sample_acc.py:359-385, 454-462):
    # metrics=[fid,kid,...] in config + a validation loader for real batches
    metric = None
    real_gen = None
    metric_choices = cfg.get("metrics") or []
    if metric_choices:
        from zigma_tpu.metrics import build_metric_suite

        # fvd routes to VideoMetric for video runs (the reference builds
        # it in sample_acc.py:82-90); every choice degrades independently
        # — canonical nets in pixel space, weight-free patch statistics
        # for the fid family / video patch stats for fvd otherwise
        # (metrics/menu.py documents the full policy)
        suite = build_metric_suite(
            choices=list(metric_choices),
            video=cfg.data.get("video_frames", 0) > 0,
            in_pixels=in_pixels, logger=logger)
        if suite.empty:
            logger.warning("metrics unavailable: every requested choice "
                           "was dropped (%s)", list(suite.dropped))
        else:
            logger.info("metrics: %s%s", suite.choices,
                        f" (dropped: {list(suite.dropped)})"
                        if suite.dropped else "")
            metric = suite
    # real batches: consumed by metrics AND by likelihood mode (which scores
    # data, not noise — don't gate the loader on metrics being configured)
    if ((metric is not None or kind == "likelihood")
            and cfg.data.get("validation") and not cfg.data.get("synthetic")):
        from zigma_tpu.cli.train import wds_batches

        # score/compare against the VALIDATION split (one finite pass), not
        # a resample of the infinite training stream
        real_gen = iter(wds_batches(cfg, model, split="validation"))

    def next_real():
        """Next validation batch, or None once the finite split is
        exhausted (a quota larger than the split must degrade gracefully,
        not crash the run with StopIteration mid-sampling)."""
        nonlocal real_gen
        if real_gen is None:
            return None
        try:
            return next(real_gen)
        except StopIteration:
            logger.warning(
                "validation split exhausted; remaining iterations run "
                "without real batches (metrics freeze at the pairs seen, "
                "text conditioning falls back to null features)")
            real_gen = None
            return None

    made = 0
    it = 0
    n_real_updates = 0
    while made < num:
        rng, kz, ks, ky = jax.random.split(rng, 4)
        z = jax.random.normal(kz, shape)
        y = None
        if cfg.data.get("num_classes", -1) > 0:  # random classes, like
            y = jax.random.randint(               # the ref's caption picks
                ky, (bs,), 0, int(cfg.data["num_classes"]))
        elif cfg.data.get("has_text"):
            # text models need caption features; draw them from the real
            # loader when available, else null (zero) conditioning (also
            # the fallback when a validation batch carries no caption key —
            # dict_collation keeps only the key intersection of a batch)
            batch = next_real()
            if batch is not None and batch.get("y") is not None:
                y = jnp.asarray(batch["y"])[:bs]
            else:
                y = example_conditioning(cfg, bs)
        if kind == "ode":
            samples = gen_ode(params, z, y)
        elif kind == "sde":
            samples = gen_sde(params, ks, z, y)
        else:
            # likelihood evaluation scores DATA; with a real loader the
            # input is a real batch (→ dataset NLL and its flow encoding);
            # without one this degrades to the reference's quirk of
            # scoring gaussian noise (sample_acc.py passes the same z to
            # every sampler kind) — warn, the number is not a dataset NLL
            batch = next_real()
            if batch is not None:
                z = jnp.asarray(batch["x"])[:bs]
                if latent_scale:
                    z = z * latent_scale
                if "y" in batch and y is not None:
                    y = jnp.asarray(batch["y"])[:bs]
            else:
                logger.warning(
                    "likelihood mode without a validation loader scores "
                    "gaussian noise, not data (reference parity quirk)")
            logp, samples = gen_lik(params, ks, z, y)
            logger.info("mean logp: %.2f", float(jnp.mean(logp)))
        if latent_scale:
            samples = samples / latent_scale
        arr = np.asarray(jax.device_get(samples), np.float32)
        if codec is not None:
            # 5-D video latents are frame-folded through the 2-D VAE
            arr = decode_maybe_video(codec, arr)
        if metric is not None:
            from zigma_tpu.metrics import to_uint8_images

            # PAIRED updates only: once the validation split exhausts, stop
            # feeding update_fake too (ADVICE r3 — an unpaired metric would
            # compare differently-sized sample sets); sampling continues,
            # the metric freezes at the pairs seen
            real_batch = next_real()
            if real_batch is not None:
                # pixel space -> the reference's uint8 metric contract
                # (sample_acc.py:384-385); raw latents stay float
                # (patch-stats tracking only)
                metric.update_fake(to_uint8_images(arr)
                                   if in_pixels else arr)
                real = np.asarray(real_batch["x"])[:bs]
                if codec is not None:
                    real = decode_maybe_video(codec, real)
                metric.update_real(to_uint8_images(real)
                                   if in_pixels else real)
                n_real_updates += 1
        if arr.ndim == 5:
            np.save(os.path.join(out_dir, f"video_{it}_{rank}.npy"), arr)
            # per-sample animated artifact next to the raw dump (the
            # reference logs wandb.Video, sample_acc.py:394-446 +
            # wandb_utils.py:91-113)
            from zigma_tpu.utils.logging_utils import write_video_grid

            for i in range(arr.shape[0]):
                idx = it * bs * world + rank * bs + i
                write_video_grid(
                    arr[i:i + 1, :, :3],
                    os.path.join(out_dir, f"{idx:06d}.gif"))
        else:
            from zigma_tpu.metrics import to_uint8_images

            # same [-1,1] -> uint8 convention as the metric updates, so
            # saved PNGs and metric inputs are bit-consistent
            png = to_uint8_images(arr)
            for i, img in enumerate(png):
                idx = it * bs * world + rank * bs + i  # sample_acc.py:388-392
                im = np.transpose(img[:3], (1, 2, 0))
                Image.fromarray(im).save(
                    os.path.join(out_dir, f"{idx:06d}.png"))
        made += bs
        it += 1
        logger.info("generated %d/%d", made, num)

    if metric is not None and n_real_updates > 0:
        scores = metric.compute()
        logger.info("metrics: %s", scores)
        import json

        with open(os.path.join(out_dir, "metrics.json"), "w") as f:
            json.dump(scores, f)
    logger.info("samples written to %s", out_dir)
    return out_dir


if __name__ == "__main__":
    main()
