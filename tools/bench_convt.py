"""Microbench: stride-2 transposed conv strategies on the attached accelerator.

The TS upsample layers (ops/modulated.py _conv_transpose2) use
lhs_dilation=2, which XLA may compute densely over the zero-stuffed input
(4x wasted MACs for k=3).  Candidates:

  a) lhs_dilation  — current implementation
  b) phase4        — 4 sub-kernel convs (ee/eo/oe/oo) + interleave
  c) combined      — one 2x2 conv with 4*O output channels + interleave

Usage: python tools/bench_convt.py [H] [C] [B]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from spgan_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

H = int(sys.argv[1]) if len(sys.argv) > 1 else 53
C = int(sys.argv[2]) if len(sys.argv) > 2 else 512
B = int(sys.argv[3]) if len(sys.argv) > 3 else 64
DT = jnp.bfloat16


def convt_dilated(x, w):
    wf = jnp.flip(w, (0, 1))
    return jax.lax.conv_general_dilated(
        x, wf, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _interleave2(a, b, axis):
    """a: (..., n, ...), b: (..., n, ...) -> (..., 2n, ...) alternating."""
    s = jnp.stack([a, b], axis=axis + 1)
    shape = list(a.shape)
    shape[axis] *= 2
    return s.reshape(shape)


def convt_phase4(x, w):
    wf = jnp.flip(w, (0, 1))  # (3,3,I,O)
    Bx, Hx, Wx, I = x.shape
    O = w.shape[-1]

    def conv(x_, k, pad):
        return jax.lax.conv_general_dilated(
            x_, k, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # out[2q,2r]   = sum x[q-1+a, r-1+b] * wf[2a, 2b]        (H+1, W+1)
    # out[2q,2r+1] = sum x[q-1+a, r]     * wf[2a, 1]         (H+1, W)
    # out[2q+1,2r] = sum x[q,     r-1+b] * wf[1, 2b]         (H, W+1)
    # out[2q+1,2r+1] =    x[q, r]        * wf[1, 1]          (H, W)
    ee = conv(x, wf[0::2, 0::2], [(1, 1), (1, 1)])
    eo = conv(x, wf[0::2, 1:2], [(1, 1), (0, 0)])
    oe = conv(x, wf[1:2, 0::2], [(0, 0), (1, 1)])
    oo = conv(x, wf[1:2, 1:2], [(0, 0), (0, 0)])
    # pad odd phases to (H+1, W+1); padded cells land on cropped rows/cols
    eo = jnp.pad(eo, ((0, 0), (0, 0), (0, 1), (0, 0)))
    oe = jnp.pad(oe, ((0, 0), (0, 1), (0, 0), (0, 0)))
    oo = jnp.pad(oo, ((0, 0), (0, 1), (0, 1), (0, 0)))
    even_rows = _interleave2(ee, eo, axis=2)  # (B, H+1, 2W+2, O)
    odd_rows = _interleave2(oe, oo, axis=2)
    out = _interleave2(even_rows, odd_rows, axis=1)  # (B, 2H+2, 2W+2, O)
    return out[:, :2 * Hx + 1, :2 * Wx + 1]


def convt_combined(x, w):
    wf = jnp.flip(w, (0, 1))
    Bx, Hx, Wx, I = x.shape
    O = w.shape[-1]
    # kernel (2,2,I,4O): phase p=(dr,dc) uses taps wf[2a+dr? ...] laid out so
    # a single conv computes all 4 phases at (H+1, W+1)
    k = jnp.zeros((2, 2, I, 4, O), x.dtype)
    k = k.at[:, :, :, 0].set(wf[0::2, 0::2])                  # ee: taps (2a,2b)
    k = k.at[:, 1:2, :, 1].set(wf[0::2, 1:2])                 # eo: col tap b=1
    k = k.at[1:2, :, :, 2].set(wf[1:2, 0::2])                 # oe
    k = k.at[1:2, 1:2, :, 3].set(wf[1:2, 1:2])                # oo
    y = jax.lax.conv_general_dilated(
        x, k.reshape(2, 2, I, 4 * O), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.reshape(Bx, Hx + 1, Wx + 1, 2, 2, O)
    # y[..., dr, dc, :]: eo valid only for r<W etc. — padded edges get cropped
    out = y.transpose(0, 1, 3, 2, 4, 5).reshape(Bx, 2 * Hx + 2, 2 * Wx + 2, O)
    return out[:, :2 * Hx + 1, :2 * Wx + 1]


def bench(fn, x, w, iters=30, name=""):
    """Chained fori_loop + final scalar fetch: the only trustworthy timing on
    the remote-attached runtime (block_until_ready returns early — see
    tools/bench_sampler.py).

    The carry consumes the conv output through the REAL downstream subgraph
    (crop [1:-1] + valid 3x3 blur + channel mean) so XLA cannot dead-code-
    eliminate output regions (a bare crop lets it skip most of the dilated
    conv's work, which invalidated an earlier version of this bench)."""
    from spgan_tpu.ops.upfirdn import Blur

    Hx, Wx = x.shape[1], x.shape[2]
    bl = Blur((1.0, 2.0, 1.0), pad=(0, 0), upsample_factor=2)

    @jax.jit
    def run(x0):
        def body(_, xc):
            y = fn(xc, w)                       # (B, 2H+1, 2W+1, O)
            y = bl(y[:, 1:-1, 1:-1])            # (B, 2H-3, 2W-3, O)
            m = jnp.mean(y, axis=3, keepdims=True)   # consumes every element
            return xc + (1e-6 * m[:, :Hx, :Wx]).astype(xc.dtype)
        return jax.lax.fori_loop(0, iters, body, x0).sum()

    _ = float(run(x))  # compile + warmup
    t0 = time.perf_counter()
    s = float(run(x))
    dt = (time.perf_counter() - t0) / iters
    useful = 9 * (x.shape[1] + 1) * (x.shape[2] + 1) * x.shape[0] * \
        x.shape[3] * w.shape[-1] * 2
    print(f"{name:12s} {dt*1e3:8.3f} ms   {useful/dt/1e12:6.1f} TF/s useful"
          f"   (checksum {s:.3e})")
    y = jax.jit(fn)(x, w)
    return y, dt


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, H, C), DT)
    w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, C, C), DT)

    ya, _ = bench(convt_dilated, x, w, name="lhs_dilation")
    yb, _ = bench(convt_phase4, x, w, name="phase4")
    yc, _ = bench(convt_combined, x, w, name="combined")
    a = np.asarray(ya, np.float32)
    for nm, y in [("phase4", yb), ("combined", yc)]:
        d = np.abs(a - np.asarray(y, np.float32)).max()
        rel = d / (np.abs(a).max() + 1e-9)
        print(f"parity {nm}: max abs {d:.3e}  rel {rel:.3e}")


if __name__ == "__main__":
    main()
