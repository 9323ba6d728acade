"""Performance harness: params, cost analysis, wall-clock FPS, traces.

Analogue of the reference's ptflops+FPS runner (reference:
opencood/tools/performance_runner.py:40-59), TPU-flavored: parameter
counts from the pytree, FLOP estimate from XLA's own cost analysis,
wall-clock with a host-transfer sync (this environment's remote-TPU
tunnel returns from block_until_ready before execution finishes), and an
optional jax.profiler trace directory for xplane tooling.

Usage:
  python -m hmvit_tpu.tools.performance --model_dir runs/<run>
      [--synthetic] [--iters N] [--trace_dir d]
"""
from __future__ import annotations

import argparse
import json
import time


def count_params(params) -> int:
    import jax

    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def xla_flops(fn, *args) -> float | None:
    """FLOP estimate from the compiled executable's cost analysis."""
    import jax

    try:
        compiled = jax.jit(fn).lower(*args).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0))
    except Exception:
        return None


def measure_fps(fn, args, iters: int = 10, sync=None) -> float:
    import jax
    import jax.numpy as jnp

    def default_sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(leaf))

    sync = sync or default_sync
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return iters / (time.perf_counter() - t0)


def main(argv=None):
    p = argparse.ArgumentParser("hmvit_tpu performance runner")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--max_points", type=int, default=30000)
    p.add_argument("--trace_dir", default="")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..config import load_config
    from ..data.opv2v import HeteroCooperativeDataset
    from .inference import load_runnable

    params = load_config("", model_dir=args.model_dir)
    if args.synthetic:
        import tempfile

        from ..data.fixture import write_mini_opv2v

        root = tempfile.mkdtemp(prefix="mini_opv2v_perf_")
        cam = params["preprocess"]["args"]["camera_preprocess"]["args"]
        write_mini_opv2v(root, 1, 2, 2, image_size=cam["resize_x"],
                         max_points=min(args.max_points, 8192))
        params["root_dir"] = params["validate_dir"] = root
    dataset = HeteroCooperativeDataset(params, train=False,
                                       max_points=args.max_points)
    batch = dataset.collate_batch([dataset[0]])
    jb = {k: jnp.asarray(v) for k, v in batch.items()
          if k not in ("object_ids", "to_ego")}

    forward, variables, _ = load_runnable(args.model_dir, batch)

    n_params = count_params(variables["params"])
    flops = xla_flops(lambda v, b: forward(v, b), variables, jb)

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            out = forward(variables, jb)
            float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))

    fps = measure_fps(forward, (variables, jb), iters=args.iters)
    report = {
        "params": n_params,
        "params_million": round(n_params / 1e6, 3),
        "flops_per_frame": flops,
        "gmacs": round(flops / 2e9, 2) if flops else None,
        "fps": round(fps, 3),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
