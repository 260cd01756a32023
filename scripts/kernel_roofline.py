"""Roofline microbenchmark for the Pallas W8A8 kernels on the real chip.

BASELINE.md's north-star asks for >=95% of per-chip int8 matmul roofline.
This measures the fused dequant+matmul kernels (`ops/pallas/w8a8_matmul`)
at the model's serving shapes (K/N of the attention projections, FFN and
generator at d_model=512) and at MXU-saturating square shapes, and reports
achieved TOPS as a fraction of chip peak.

The reference has no analogue (its int8 matmuls run through ONNX-Runtime /
qonnx node evaluation on CPU, `onnx_optimized_inference.py:18-234`).

Usage: python scripts/kernel_roofline.py [--json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

from onnx_transformer_tpu.ops.pallas import w8a8_matmul as K

# Per-generation int8 peaks (TOP/s); %roofline is meaningless against the
# wrong chip's peak, so unknown kinds must be given --peak-tops explicitly.
PEAK_INT8_BY_KIND = {
    "TPU v4": 275e12,        # bf16 peak; v4 has no int8 doubling
    "TPU v5 lite": 394e12,   # v5e: ~197 TFLOP/s bf16, 2x for int8
    "TPU v5e": 394e12,
    "TPU v5": 459e12 * 2,    # v5p
    "TPU v5p": 459e12 * 2,
    "TPU v6 lite": 918e12,   # v6e/Trillium
    "TPU v6e": 918e12,
}


def peak_for(device_kind: str, override: float | None = None) -> float:
    if override:
        return override
    for k, v in PEAK_INT8_BY_KIND.items():
        if device_kind.startswith(k):
            return v
    raise SystemExit(
        f"unknown device kind {device_kind!r}: pass --peak-tops explicitly")


def _bench_chain(step, carry0, iters: int = 32, reps: int = 3) -> float:
    """Time ``iters`` data-dependent kernel invocations inside ONE jitted
    program, synced by a scalar host fetch.  Through the axon tunnel,
    ``block_until_ready`` on a single dispatch is not a reliable barrier
    (it reports enqueue, not completion — measured 50x over roofline);
    chaining the kernel into a fori_loop carry and pulling one scalar to
    the host amortises the RTT and forces true completion."""
    run = jax.jit(lambda c: jnp.ravel(
        jax.lax.fori_loop(0, iters, step, c))[0])
    float(run(carry0))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(carry0))
        times.append(time.perf_counter() - t0)
    return float(min(times)) / iters


def run(shapes, peak):
    rng = np.random.default_rng(0)
    rows = []
    for m, k, n, tag in shapes:
        # w8a8_matmul K-tiles via block_k; quant_w8a8_matmul still holds full
        # K in VMEM, so shrink the M block as K grows to keep x-block +
        # w-block + double buffering under the ~16MB budget
        block_m = 512 if k <= 2048 else 256
        block_n = 512
        xq = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
        sx = jnp.full((m,), 0.02, jnp.float32)
        wq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        sw = jnp.full((n,), 0.01, jnp.float32)

        # chain through the per-token scales / the input so each iteration
        # depends on the previous kernel's output (defeats hoisting/overlap)
        def pre_step(i, s, xq=xq, wq=wq, sw=sw):
            out = K.w8a8_matmul(xq, s, wq, sw,
                                block_m=block_m, block_n=block_n)
            return s + out[:, 0] * 1e-12

        def fused_step(i, xc, wq=wq, sw=sw, k=k, n=n):
            out = K.quant_w8a8_matmul(xc, wq, sw,
                                      block_m=block_m, block_n=block_n)
            fb = out[:, :k] if n >= k else jnp.pad(out, ((0, 0), (0, k - n)))
            return xc + fb * 1e-9

        t_pre = _bench_chain(pre_step, sx)
        t_fused = _bench_chain(fused_step, x)
        flops = 2.0 * m * k * n
        rows.append({
            "shape": f"{m}x{k}x{n}", "tag": tag,
            "prequant_tops": flops / t_pre / 1e12,
            "prequant_roofline": flops / t_pre / peak,
            "fused_quant_tops": flops / t_fused / 1e12,
            "fused_quant_roofline": flops / t_fused / peak,
        })
    return rows


def sweep(peak):
    """Block-size sweep of the pre-quantized kernel on the big shapes."""
    rng = np.random.default_rng(0)
    shapes = [(16384, 4096, 4096), (36864, 512, 4480), (36864, 2048, 512)]
    configs = [(256, 512, 2048), (512, 512, 2048), (512, 1024, 2048),
               (1024, 512, 2048), (512, 512, 4096), (1024, 1024, 1024),
               (256, 256, 4096)]
    for m, k, n in shapes:
        xq = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
        sx = jnp.full((m,), 0.02, jnp.float32)
        wq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        sw = jnp.full((n,), 0.01, jnp.float32)
        flops = 2.0 * m * k * n
        print(f"--- {m}x{k}x{n}")
        for bm, bn, bk in configs:
            if bn > n or bm > m:
                continue

            def step(i, s, xq=xq, wq=wq, sw=sw, bm=bm, bn=bn, bk=bk):
                out = K.w8a8_matmul(xq, s, wq, sw,
                                    block_m=bm, block_n=bn, block_k=bk)
                return s + out[:, 0] * 1e-12

            try:
                t = _bench_chain(step, sx, iters=16, reps=2)
            except Exception as e:
                print(f"  bm={bm} bn={bn} bk={bk}: FAIL {str(e)[:80]}")
                continue
            print(f"  bm={bm} bn={bn} bk={bk}: {flops/t/1e12:7.1f} TOPS "
                  f"({flops/t/peak*100:5.1f}% roofline)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--peak-tops", type=float, default=None,
                    help="chip int8 peak in TOP/s (required for unknown kinds)")
    args = ap.parse_args()
    dev = jax.devices()[0]
    peak = peak_for(str(dev.device_kind),
                    args.peak_tops * 1e12 if args.peak_tops else None)
    if args.sweep:
        sweep(peak)
        return
    b, t = 512, 72  # serving batch x max_len (BASELINE.json config)
    shapes = [
        (b * t, 512, 512, "attn q/k/v/o proj"),
        (b * t, 512, 2048, "ffn w1"),
        (b * t, 2048, 512, "ffn w2"),
        (b * t, 512, 4480, "generator (vocab 4444 padded)"),
        (8192, 2048, 2048, "square 8k*2k*2k"),
        (16384, 4096, 4096, "square 16k*4k*4k (saturating)"),
    ]
    rows = run(shapes, peak)
    out = {"device": str(dev.device_kind), "peak_int8_tops": peak / 1e12,
           "rows": rows}
    if args.json:
        print(json.dumps(out))
        return
    print(f"device: {dev.device_kind}  peak int8: {peak/1e12:.0f} TOPS")
    print(f"{'shape':>18} {'tag':<28} {'pre-q TOPS':>10} {'%roof':>6} "
          f"{'fused TOPS':>10} {'%roof':>6}")
    for r in rows:
        print(f"{r['shape']:>18} {r['tag']:<28} {r['prequant_tops']:>10.1f} "
              f"{r['prequant_roofline']*100:>5.1f}% "
              f"{r['fused_quant_tops']:>10.1f} "
              f"{r['fused_quant_roofline']*100:>5.1f}%")


if __name__ == "__main__":
    main()
