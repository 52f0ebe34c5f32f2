"""Benchmark: SDXL 1024x1024 text-to-image, 30 denoise steps + VAE decode,
bf16, CFG 5.0 — the BASELINE.json north-star configuration.
Prints ONE JSON line.

The 30-step loop is one jitted lax.scan program (zero host round-trips
between steps); runs are chained on data so every iteration is real work.
North star: >= 1 img/s per v5e-8; vs_baseline is img/s against that 1.0.

Modes:
  python bench.py                     # single chip, batch 1 (default signal)
  python bench.py --data-parallel     # DP over all visible devices: one
                                      # image per "data" row, TP off — the
                                      # multi-chip throughput path
  python bench.py --batch N           # images per diffuse call (DP mode)
"""

from __future__ import annotations

import argparse
import json
import time


def _materialize_on_device(module, dev) -> None:
    """Replace a host-built module's ≥2-D float leaves with seeded on-device
    random arrays (init-like statistics; fan-in scaled) and bulk-transfer the
    small 1-D leaves — identical FLOPs/memory traffic to real weights without
    shipping GBs through the tunnel."""
    import jax
    import jax.numpy as jnp

    entries = list(module.arrays())
    big = [(p, a) for p, a in entries if jnp.issubdtype(a.dtype, jnp.floating) and a.ndim >= 2]
    small = [(p, a) for p, a in entries if not (jnp.issubdtype(a.dtype, jnp.floating) and a.ndim >= 2)]
    shapes = [(a.shape, a.dtype) for _, a in big]

    def materialize(key: jax.Array) -> list[jax.Array]:
        keys = jax.random.split(key, len(shapes))
        out = []
        for k, (shape, dt) in zip(keys, shapes):
            fan_in = 1
            for s in shape[:-1]:
                fan_in *= s
            out.append(jax.random.normal(k, shape, jnp.float32).astype(dt) * (fan_in**-0.5))
        return out

    placed = jax.jit(materialize, out_shardings=[jax.sharding.SingleDeviceSharding(dev)] * len(shapes))(
        jax.random.key(7)
    )
    for (path, _), arr in zip(big, placed):
        module._set_array_by_path(path, arr)
    small_placed = jax.device_put([a for _, a in small], dev)
    for (path, _), arr in zip(small, small_placed):
        module._set_array_by_path(path, arr)


def bench_sam(runs: int, breakdown: bool = False, profile: str | None = None, pipeline: int = 0) -> None:
    """SAM ViT-H masks/s on the chip: image encode (1024², 32-layer windowed
    rel-pos ViT — the hot kernel) + one point-prompt decode per iteration.
    BASELINE.json's metric line names 'SAM masks/s' as the second flagship.

    Per predict, the device work is exactly TWO compiled programs (encode,
    fused prompt-encode+decode+upsample+binarize) plus one 3 MB uint8 image
    upload and one 3 MB bool mask readback — see
    refiners_tpu/foundationals/segment_anything/model.py."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from refiners_tpu.fluxion import manual_seed
    from refiners_tpu.foundationals.segment_anything import SegmentAnythingH

    manual_seed(0)
    with jax.default_device(jax.devices("cpu")[0]):
        sam = SegmentAnythingH(dtype=jnp.bfloat16)
    if jax.default_backend() != "cpu":
        _materialize_on_device(sam, jax.devices()[0])

    image = Image.fromarray(np.random.RandomState(0).randint(0, 255, (1024, 1024, 3), dtype=np.uint8))
    prompt = dict(foreground_points=[(512.0, 512.0)])

    def one() -> float:
        embedding = sam.compute_image_embedding(image)
        masks, iou, _ = sam.predict(embedding, **prompt)
        # ONE batched device→host fetch for both outputs (separate np.asarray
        # calls each pay the tunnel's per-readback RTT)
        masks_h, iou_h = jax.device_get((masks, iou))
        total = float(np.asarray(iou_h, dtype=np.float32).sum()) + float(np.count_nonzero(masks_h))
        assert total == total, "non-finite SAM output"
        return float(masks.shape[0] if masks.ndim == 3 else masks.shape[1])

    n_masks = one()  # warmup / compile
    if profile:
        with jax.profiler.trace(profile):
            one()
    times: list[float] = []
    for _ in range(runs):
        t0 = time.perf_counter()
        n_masks = one()
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]

    if breakdown:
        # Per-phase attribution (VERDICT r4 item 1): host preprocess, the two
        # device programs (scalar-readback-synced), the full-mask readback,
        # and the bare dispatch+readback floor a trivial program pays through
        # the tunnel. Each median-of-`runs`.
        def med(fn, sync=None):
            ts = []
            for _ in range(runs):
                t0 = time.perf_counter()
                out = fn()
                if sync is not None:
                    sync(out)
                ts.append(time.perf_counter() - t0)
            ts.sort()
            return ts[len(ts) // 2]

        canvas, scaled = sam._host_preprocess(image)
        t_host_pre = med(lambda: sam._host_preprocess(image))

        from refiners_tpu.foundationals.segment_anything.model import _encode_image, _root_chain

        root = _root_chain(sam)
        scalar = lambda out: float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))  # noqa: E731
        _ = scalar(_encode_image(root, canvas, scaled))  # compile
        t_encode = med(lambda: _encode_image(root, canvas, scaled), sync=scalar)

        embedding = sam.compute_image_embedding(image)
        # decode program + scalar sync (the iou head) — isolates program time
        t_decode = med(lambda: sam.predict(embedding, **prompt)[1], sync=scalar)
        # full predict incl. the (N, M, 1024, 1024) bool mask readback
        t_decode_rb = med(
            lambda: sam.predict(embedding, **prompt)[0], sync=lambda m: np.asarray(m).sum()
        )

        trivial = jax.jit(lambda v: v + 1)
        _ = scalar(trivial(jnp.ones((8, 128), jnp.float32)))
        t_floor = med(lambda: trivial(jnp.ones((8, 128), jnp.float32)), sync=scalar)

        print(
            json.dumps(
                {
                    "sam_breakdown_s": {
                        "end_to_end_predict": round(dt, 4),
                        "host_preprocess": round(t_host_pre, 4),
                        "encode_program": round(t_encode, 4),
                        "decode_program": round(t_decode, 4),
                        "decode_plus_mask_readback": round(t_decode_rb, 4),
                        "dispatch_readback_floor": round(t_floor, 4),
                    },
                    "note": "encode/decode include one dispatch+readback floor each; "
                    "encode_device ≈ encode_program − floor",
                }
            )
        )

    result = {
        "synthetic_weights": True,
        "metric": "SAM ViT-H 1024² encode + point-prompt decode (bf16, single v5e chip)",
        "value": round(n_masks / dt, 4),
        "unit": "masks/s",
        "per_predict_s": round(dt, 4),
    }

    if pipeline:
        # Throughput mode (predict_pipelined): every request's programs are
        # enqueued before any readback, so the tunnel transfer of request i
        # overlaps the device compute of requests i+1… — this measures the
        # serving rate, where the serial number above measures latency.
        # Distinct prompt points per request (same compiled specialization,
        # as in real point-prompt serving).
        prompts_n = [dict(foreground_points=[(64.0 + 896.0 * i / pipeline, 512.0)]) for i in range(pipeline)]
        images_n = [image] * pipeline

        def batch() -> float:
            outs = sam.predict_pipelined(images_n, prompts_n)
            total = sum(float(np.count_nonzero(m)) + float(i.sum()) for m, i, _ in outs)
            assert total == total, "non-finite SAM output"
            return float(outs[0][0].shape[0] if outs[0][0].ndim == 3 else outs[0][0].shape[1])

        n_masks_p = batch()  # warmup (prompt specializations compile once)
        pts: list[float] = []
        for _ in range(runs):
            t0 = time.perf_counter()
            n_masks_p = batch()
            pts.append(time.perf_counter() - t0)
        pts.sort()
        per_predict = pts[len(pts) // 2] / pipeline
        result["pipelined"] = {
            "requests": pipeline,
            "value": round(n_masks_p / per_predict, 4),
            "unit": "masks/s",
            "per_predict_s": round(per_predict, 4),
        }

    print(json.dumps(result))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-parallel", action="store_true", help="DP-shard a multi-image batch over all devices")
    parser.add_argument("--batch", type=int, default=None, help="images per diffuse call (defaults to device count)")
    parser.add_argument(
        "--int8",
        action="store_true",
        help="W8A8-quantize UNet attention/FF linears (int8 MXU dots; A/B the serving quant path)",
    )
    parser.add_argument(
        "--sam",
        action="store_true",
        help="benchmark the second flagship instead: SAM ViT-H masks/s (encode + point decode)",
    )
    parser.add_argument(
        "--pipeline",
        type=int,
        default=0,
        metavar="N",
        help="with --sam: also measure predict_pipelined serving throughput over N overlapped requests",
    )
    # median over 5: a single depressed run (host core still draining prior
    # work, tunnel hiccup) must not set the headline number
    parser.add_argument("--runs", type=int, default=5)
    parser.add_argument(
        "--breakdown",
        action="store_true",
        help="also print a per-phase profile (unet step / solver / decode / scan+host gap) as a second JSON line",
    )
    parser.add_argument(
        "--profile",
        metavar="DIR",
        default=None,
        help="capture a jax.profiler device trace of one timed run into DIR (parse with tools/parse_profile.py)",
    )
    args = parser.parse_args()

    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/refiners_tpu_xla_cache")

    if args.sam:
        bench_sam(args.runs, breakdown=args.breakdown, profile=args.profile, pipeline=args.pipeline)
        return

    import jax
    import jax.numpy as jnp

    import refiners_tpu.fluxion.layers as fl
    from refiners_tpu.fluxion import manual_seed
    from refiners_tpu.foundationals.latent_diffusion import DDIM, SDXLAutoencoder, SDXLUNet, StableDiffusion_XL

    manual_seed(0)
    dtype = jnp.bfloat16
    # build on the host: eager layer-init ops over a remote-tunnel TPU pay a
    # full RTT each (measured: 14 MINUTES of construction); on CPU it's
    # seconds. Weights are then MATERIALIZED ON DEVICE by one jitted program
    # (random with init-like statistics; 1-D leaves zero) instead of shipping
    # ~5 GB through the tunnel — the compiled diffuse program, its FLOPs and
    # its memory traffic are identical to real weights. Solver tables are
    # transferred for real (tiny) so the denoise trajectory stays finite.
    with jax.default_device(jax.devices("cpu")[0]):
        sd = StableDiffusion_XL(
            unet=SDXLUNet(in_channels=4, dtype=dtype),
            lda=SDXLAutoencoder(dtype=dtype),
            # the benchmark feeds precomputed embeddings; skip building CLIP
            clip_text_encoder=fl.Chain(fl.Identity()),  # type: ignore[arg-type]
            solver=DDIM(num_inference_steps=30),
        )
        if args.int8:
            # opt-in serving quantization: int8 weights for every large UNet
            # linear (attention/FF projections), per-channel scales — weight
            # HBM traffic ÷2 vs bf16. Runs on the CPU copies (deterministic
            # rounding) BEFORE device materialization; the timed program's
            # int8 matmuls are identical to real quantized weights.
            from refiners_tpu.fluxion.optimization import quantize_linears

            n_quant = quantize_linears(sd.unet, min_features=256)
            assert n_quant > 0, "no linears quantized"
    if jax.default_backend() != "cpu":
        dev = jax.devices()[0]
        sd.solver = jax.device_put(sd.solver, dev)
        for module in (sd.unet, sd.lda):
            entries = list(module.arrays())
            shapes = [(a.shape, a.dtype) for _, a in entries]

            def materialize(key: jax.Array) -> list[jax.Array]:
                keys = jax.random.split(key, len(shapes))
                out = []
                for k, (shape, dt) in zip(keys, shapes):
                    if jnp.issubdtype(dt, jnp.floating) and len(shape) >= 2:
                        fan_in = 1
                        for s in shape[:-1]:
                            fan_in *= s
                        out.append(jax.random.normal(k, shape, jnp.float32).astype(dt) * (fan_in**-0.5))
                    else:
                        out.append(jnp.zeros(shape, dt))
                return out

            placed = jax.jit(materialize, out_shardings=[jax.sharding.SingleDeviceSharding(dev)] * len(shapes))(
                jax.random.key(0)
            )
            for (path, _), arr in zip(entries, placed):
                module._set_array_by_path(path, arr)

    n_dev = len(jax.devices())
    batch = args.batch or (n_dev if args.data_parallel else 1)

    # seeded random conditioning with distinct cond/uncond rows — same FLOPs
    # as zeros, but the timed program exercises real cross-attn K/V and a
    # non-trivial CFG combine (mirrors the on-chip correctness gate)
    import numpy as np

    emb = jnp.asarray(np.random.RandomState(5).randn(2 * batch, 77, 2048), dtype)
    pooled = jnp.asarray(np.random.RandomState(6).randn(2 * batch, 1280), dtype)
    time_ids = jnp.tile(sd.default_time_ids, (batch, 1))
    x0 = jax.random.normal(jax.random.key(0), (batch, 128, 128, 4), dtype)

    if args.data_parallel:
        from refiners_tpu.parallel import make_mesh, shard_inputs, shard_latent_diffusion

        mesh = make_mesh(tensor=1)
        shard_latent_diffusion(sd, mesh, tp_rules=[])
        x0, emb, pooled, time_ids = shard_inputs(mesh, x0, emb, pooled, time_ids)

    diffuse = jax.jit(
        lambda m, x, e, p, t: m.diffuse(
            x, clip_text_embedding=e, pooled_text_embedding=p, time_ids=t, condition_scale=5.0
        )
    )
    decode = jax.jit(lambda lda, z: lda.decode(z))

    # warmup / compile (host-fetch: block_until_ready alone can return at
    # enqueue time on remote-tunnel backends, so force a device→host readback)
    z = diffuse(sd, x0, emb, pooled, time_ids)
    img = decode(sd.lda, z)
    float(jnp.sum(img.astype(jnp.float32)))

    # chain each run on the previous outputs (incl. the decoded image) so no
    # iteration's work can be skipped or overlapped away; per-run times are
    # host-synced by a device→host readback, and we report the MEDIAN — the
    # shared host core also feeds the TPU tunnel, so a busy box produces
    # outlier runs that say nothing about the chip
    x = x0
    if args.profile:
        # one traced run of the exact timed programs (post-warmup, so the
        # trace holds steady-state device execution, not compilation)
        with jax.profiler.trace(args.profile):
            z = diffuse(sd, x, emb, pooled, time_ids)
            img = decode(sd.lda, z)
            float(jnp.sum(img.astype(jnp.float32)))
    times: list[float] = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        z = diffuse(sd, x, emb, pooled, time_ids)
        img = decode(sd.lda, z)
        x = z / 14.6 + (jnp.mean(img) * 0).astype(dtype)  # renormalize + decode dependency
        total = float(jnp.sum(x.astype(jnp.float32)))
        assert total == total, "non-finite benchmark output"
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]

    if args.breakdown:
        # Per-phase wall-clock attribution for the headline program (VERDICT r2
        # item 4). Each phase is timed as its own jitted program with an honest
        # device→host readback sync (see memory: block_until_ready can return
        # at enqueue time through the tunnel); the residue rows are derived:
        #   scan_gap = diffuse − steps·(unet_cfg_step + solver_step)
        #   host_gap = end_to_end − diffuse − decode
        def timed(fn, *fargs, runs=args.runs):
            ts = []
            float(jnp.sum(jax.tree.leaves(fn(*fargs))[0].astype(jnp.float32)))  # compile
            for _ in range(runs):
                t0 = time.perf_counter()
                out = fn(*fargs)
                float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
                ts.append(time.perf_counter() - t0)
            ts.sort()
            return ts[len(ts) // 2]

        n_steps = sd.solver.num_inference_steps
        step0 = jnp.asarray(0)
        unet_step = jax.jit(
            lambda m, v, e, p, t, s: m.predict_noise(
                v, s, clip_text_embedding=e, pooled_text_embedding=p, time_ids=t, condition_scale=5.0
            )
        )
        noise_like = jnp.zeros_like(x)
        solver_step = jax.jit(lambda m, v, n, s: m.solver(v, predicted_noise=n, step=s))
        t_unet = timed(unet_step, sd, x, emb, pooled, time_ids, step0)
        t_solver = timed(solver_step, sd, x, noise_like, step0)
        t_diffuse = timed(diffuse, sd, x, emb, pooled, time_ids)
        t_decode = timed(decode, sd.lda, z)
        print(
            json.dumps(
                {
                    "breakdown_s": {
                        "end_to_end": round(dt, 4),
                        "diffuse_scan": round(t_diffuse, 4),
                        "unet_cfg_step": round(t_unet, 4),
                        "solver_step": round(t_solver, 5),
                        "vae_decode": round(t_decode, 4),
                        "scan_gap": round(t_diffuse - n_steps * (t_unet + t_solver), 4),
                        "host_gap": round(dt - t_diffuse - t_decode, 4),
                    },
                    "num_steps": n_steps,
                }
            )
        )

    value = batch / dt
    # north star (BASELINE.json): >= 1 img/s per v5e-8, i.e. 0.125 img/s/chip
    per_chip_target = 0.125 * (n_dev if args.data_parallel else 1)
    suffix = f", DP batch {batch} over {n_dev} dev" if args.data_parallel else ", single v5e chip"
    if args.int8:
        suffix = ", int8 unet linears" + suffix
    print(
        json.dumps(
            {
                # weights are synthetic (materialized on device with init-like
                # statistics, see above) — timing-identical to real weights
                # since the compute is data-independent, but self-describing
                "synthetic_weights": True,
                "metric": f"SDXL 1024x1024 30-step txt2img (bf16, CFG{suffix})",
                "value": round(value, 4),
                "unit": "img/s",
                "vs_baseline": round(value / per_chip_target, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
