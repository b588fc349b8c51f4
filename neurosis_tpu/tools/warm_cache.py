"""Pre-compile the train step for every aspect-bucket latent shape.

Aspect bucketing gives ≤40 distinct batch shapes (SURVEY.md §7 hard-part 4);
each is one XLA executable. Run this once per (model config, batch size) to
populate the persistent compile cache so training never stalls on a first-seen
bucket:

  python -m neurosis_tpu.tools.warm_cache -c configs/sdxl/sdxl.example.yaml \\
      --batch-size 2 [--buckets sdxl]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-c", "--config", type=Path, required=True)
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--limit", type=int, default=0, help="warm only the first N buckets")
    args = parser.parse_args(argv)

    import jax

    cache_dir = os.path.expanduser("~/.cache/neurosis_tpu_xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)

    import numpy as np

    from neurosis_tpu.config import instantiate, load_config
    from neurosis_tpu.trainer.builder import build_diffusion_engine
    from neurosis_tpu.trainer.loop import Trainer

    cfg = load_config(args.config)
    engine = build_diffusion_engine(cfg["model"])
    engine.ckpt_path = None  # warm with random weights

    data_args = cfg["data"].get("init_args") or {}
    buckets = instantiate(data_args.get("buckets")) if data_args.get("buckets") else None
    if buckets is None:
        from neurosis_tpu.data.aspect import SDXLBucketList

        buckets = SDXLBucketList()

    trainer = Trainer(engine, default_root_dir="/tmp/neurosis_warm")
    shapes = [(b.height, b.width) for b in buckets]
    if args.limit:
        shapes = shapes[: args.limit]

    state = frozen = None
    rng = np.random.RandomState(0)
    for i, (h, w) in enumerate(shapes):
        batch = {
            "image": rng.randn(args.batch_size, h, w, 3).astype(np.float32),
            "caption": ["warmup"] * args.batch_size,
            "original_size_as_tuple": [(w, h)] * args.batch_size,
            "crop_coords_top_left": [(0, 0)] * args.batch_size,
            "target_size_as_tuple": [(w, h)] * args.batch_size,
        }
        prepped = trainer.prepare_batch(batch)
        if state is None:
            state, frozen = engine.init(jax.random.PRNGKey(0), prepped)
        t0 = time.time()
        key = prepped[engine.input_key].shape
        state, metrics = trainer._step_fn(key)(state, frozen, prepped)
        print(f"[{i + 1}/{len(shapes)}] {h}x{w}: compiled+ran in {time.time() - t0:.1f}s "
              f"loss={float(metrics['loss']):.4f}", file=sys.stderr, flush=True)
    print(f"warmed {len(shapes)} bucket shapes into {cache_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
