#!/usr/bin/env python
"""Launch the CAVP-TPU serving daemon.

    python scripts/serve.py --setup avss --resize_flag \
        --ckpt_path avss_224.pth --port 8000

Accepts orbax directories or reference torch ``.pth`` checkpoints (the
strict converter runs on load). Wire protocol in
``cavp_tpu/engine/server.py``; a minimal client:

    import io, urllib.request, numpy as np
    buf = io.BytesIO(); np.savez(buf, images=imgs, waveforms=wavs)
    r = urllib.request.urlopen(
        urllib.request.Request("http://host:8000/predict",
                               data=buf.getvalue(), method="POST"))
    mask = np.load(io.BytesIO(r.read()))["mask"]
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    import jax

    from cavp_tpu.utils.hostfp import set_compile_cache

    set_compile_cache("/tmp/jax_tpu_cache")

    from cavp_tpu.config import load_args_and_config
    from cavp_tpu.engine.predictor import Predictor
    from cavp_tpu.engine.server import serve

    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--host", default="0.0.0.0")
    extra.add_argument("--port", default=8000, type=int)
    extra.add_argument("--buckets", default="1,8", type=str,
                       help="comma-separated compiled batch sizes")
    extra.add_argument("--max_wait_ms", default=5.0, type=float)
    extra.add_argument("--return_probs", action="store_true")
    extra.add_argument("--allow_random_weights", action="store_true",
                       help="serve without a checkpoint (bench/debug only)")
    extra.add_argument("--artifact", default="", type=str,
                       help="serve a jax.export StableHLO artifact dir "
                            "(scripts/export_model.py) — no checkpoint "
                            "or model config needed")
    extra_args, rest = extra.parse_known_args()

    if extra_args.artifact:
        from cavp_tpu.engine.export import ExportedPredictor

        predictor = ExportedPredictor(extra_args.artifact)
        serve(predictor, host=extra_args.host, port=extra_args.port,
              max_wait_ms=extra_args.max_wait_ms)
        return

    config = load_args_and_config(rest)
    if not config.ckpt_path and not extra_args.allow_random_weights:
        raise SystemExit(
            "refusing to serve untrained (randomly initialized) weights: "
            "pass --ckpt_path <orbax dir | torch .pth>, or "
            "--allow_random_weights for bench/debug")
    buckets = tuple(int(b) for b in extra_args.buckets.split(","))
    predictor = Predictor(config, ckpt_path=config.ckpt_path,
                          batch_sizes=buckets,
                          return_probs=extra_args.return_probs)
    serve(predictor, host=extra_args.host, port=extra_args.port,
          max_wait_ms=extra_args.max_wait_ms)


if __name__ == "__main__":
    main()
