"""Encoder throughput sweep (reference: dev/dev_encoder.py:77-104 +
dev/encoder_summaries.txt): per-arch latency / imgs-per-sec / param count /
annotation shape, printed in the reference's line format."""

from __future__ import annotations

import argparse
import time
from typing import List, Optional


def count_params(tree) -> int:
    import jax
    import numpy as np
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree)))


def sweep(archs: List[str], batch: int = 32, input_size: int = 224,
          encoder_size: Optional[int] = None, encoder_dim: Optional[int] = None,
          precision: int = 16, k_small: int = 2, k_large: int = 10):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial
    from ..config import SATConfig
    from ..models.encoder import SATEncoder, build_encoder

    rows = []
    for arch in archs:
        cfg = SATConfig(encoder_arch=arch, input_size=input_size,
                        encoder_size=encoder_size, encoder_dim=encoder_dim)
        module, variables, cfg, grid = build_encoder(cfg, jax.random.PRNGKey(0))
        params_m = count_params(variables["params"]) * 1e-6
        if precision == 16:
            variables = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, variables)
        dt_in = jnp.bfloat16 if precision == 16 else jnp.float32
        data = jnp.asarray(np.random.default_rng(0).random(
            (batch, input_size, input_size, 3), np.float32), dtype=dt_in)

        @partial(jax.jit, static_argnums=2)
        def loop(variables, im, k):
            def body(i, carry):
                im, acc = carry
                y = module.apply(variables, im)
                acc = acc + y.sum().astype(jnp.float32)
                im = im + (acc % 3).astype(im.dtype) * jnp.asarray(1e-4, im.dtype)
                return (im, acc)
            return jax.lax.fori_loop(0, k, body, (im, jnp.float32(0)))[1]

        times = {}
        for k in (k_small, k_large):
            np.array(loop(variables, data, k))
            t0 = time.time()
            np.array(loop(variables, data, k))
            times[k] = time.time() - t0
        dt = (times[k_large] - times[k_small]) / (k_large - k_small)
        y_shape = jax.eval_shape(lambda v, d: module.apply(v, d), variables, data)
        _, attention, features = y_shape.shape
        latency = dt * 1e3
        row = dict(arch=arch, features=features, attention=attention,
                   params=params_m, latency_ms=latency, batch=batch,
                   batches_per_sec=1 / dt, imgs_per_sec=batch / dt)
        rows.append(row)
        print(f"arch={arch:18} features={features:4d} attention={attention:3d} "
              f"params={params_m:6.2f}M. bf16={precision==16!s:5} "
              f"Latency={latency:7.3f} ms. batch={batch:4d}. "
              f"Batches/s={1/dt:5.1f}. Imgs/s={batch/dt:7.1f}.")
    return rows


def main(argv=None):
    from ..utils.platform import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser(description="encoder throughput sweep")
    p.add_argument("--archs", nargs="+", default=[
        "shufflenet_v2_x0_5", "mobilenet_v3_small", "squeezenet1_1",
        "resnet18", "resnet50"])
    p.add_argument("--batch", default=32, type=int)
    p.add_argument("--input_size", default=224, type=int)
    p.add_argument("--encoder_size", default=None, type=int)
    p.add_argument("--encoder_dim", default=None, type=int)
    p.add_argument("--precision", default=16, type=int, choices=[16, 32])
    a = p.parse_args(argv)
    sweep(a.archs, a.batch, a.input_size, a.encoder_size, a.encoder_dim,
          a.precision)


if __name__ == "__main__":
    main()
