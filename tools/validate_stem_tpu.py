"""Hardware validation + A/B for the fused Pallas stem kernel (kernels/stem.py).

The CPU suite pins the kernel's numerics in interpret mode
(tests/test_stem_kernel.py); this script is the REAL-chip leg: Mosaic
lowering, numeric parity vs the XLA stem on hardware, and the perf A/B that
decides whether the auto-on policy earns its keep.

Run (real TPU):        python tools/validate_stem_tpu.py
Numerics only (fast):  python tools/validate_stem_tpu.py --numerics_only

Per-family numeric check: encode the same images with fused_stem forced on
and off (everything downstream identical) and compare annotations.  Perf A/B:
bench.py's chained-K marginal-time method at the flagship decode config.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

FAMILIES = [  # one representative per STEM_PLANS entry
    ("shufflenet_v2_x0_5", 224),
    ("mobilenet_v2", 224),
    ("mobilenet_v3_small", 224),
    ("mnasnet0_5", 224),
    ("resnet18", 224),
    ("resnext50_32x4d", 224),
    ("wide_resnet50_2", 224),
    ("densenet121", 224),
]


def check_family(arch: str, size: int, precision: int, batch: int = 4):
    import jax
    import jax.numpy as jnp
    from bench import build_model

    model, variables = build_model(arch, size, 256, precision)
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16 if precision == 16 else jnp.float32
    images = jnp.asarray(rng.random((batch, size, size, 3), np.float32), dt)

    def annots(on: bool):
        model.cfg = model.cfg.replace(fused_stem=on)
        return np.asarray(jax.jit(
            lambda v, im: model.encode(v, im, train=False))(variables, images),
            np.float32)

    a_off, a_on = annots(False), annots(True)
    # annotation elements cluster near zero, so element-wise relative error is
    # meaningless; compare the error's scale against the SIGNAL's scale
    nme = np.max(np.abs(a_on - a_off)) / max(np.max(np.abs(a_off)), 1e-6)
    corr = float(np.corrcoef(a_on.ravel(), a_off.ravel())[0, 1])
    return nme, corr


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--numerics_only", action="store_true")
    p.add_argument("--precision", default=16, type=int, choices=[16, 32])
    p.add_argument("--families", nargs="+", default=None)
    args = p.parse_args()

    from sat_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    print(f"backend: {jax.default_backend()}, devices: {jax.device_count()}")

    fams = ([(f, 224) for f in args.families] if args.families else FAMILIES)
    # bf16: the two stems round differently and the whole backbone amplifies;
    # measured on CPU-interpret the normalized max error is ~1.5% with corr
    # 0.9999 (fp32 is exact to 1e-7)
    tol, min_corr = (0.08, 0.995) if args.precision == 16 else (1e-4, 1.0 - 1e-9)
    ok = True
    for arch, size in fams:
        try:
            nme, corr = check_family(arch, size, args.precision)
            good = nme < tol and corr > min_corr
            ok &= good
            print(f"{arch:24s} norm max err {nme:.2e} corr {corr:.6f}  "
                  f"{'OK' if good else 'FAIL'}")
        except Exception as e:
            ok = False
            print(f"{arch:24s} ERROR {type(e).__name__}: {e}")
    if not ok:
        print("NUMERIC/COMPILE FAILURES — keep fused_stem auto policy OFF")
        sys.exit(1)
    print("all families numerically validated on this backend")

    if args.numerics_only:
        return

    # perf A/B at the flagship decode config (greedy, b256/b512)
    from bench import bench_batch, build_model
    model, variables = build_model("shufflenet_v2_x0_5", 224, 4096,
                                   args.precision, encoder_dim=128)
    for b in (256, 512):
        row = {}
        for on in (False, True):
            model.cfg = model.cfg.replace(fused_stem=on)
            v, spread = bench_batch(model, variables, b, 16, args.precision,
                                    k_small=2, k_large=10, reps=3)
            row[on] = (v, spread)
        off_v, on_v = row[False][0], row[True][0]
        print(f"b{b}: XLA stem {off_v:.0f} imgs/s (±{row[False][1]:.0%})  "
              f"fused stem {on_v:.0f} imgs/s (±{row[True][1]:.0%})  "
              f"delta {(on_v / off_v - 1):+.1%}")


if __name__ == "__main__":
    main()
