"""Per-op timing of the TS hot chain with chained fori_loop + value fetch
(the only trustworthy method on the remote-attached runtime).

Times, at the folded-batch shapes of the canonical 384x768 close-loop task
(chunk 4 x batch 16 = 64 samples), each distinct op class:
  - plain modulated conv k3 (conv1/3/5/7 shapes)
  - upsample modulated conv (convT via lhs_dilation) (conv0/2/4/6 shapes)
  - the post-upsample depthwise blur
  - ToRGB k1 + skip upsample

Usage: python tools/bench_ts_layers.py [iters]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from spgan_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from spgan_tpu.ops.modulated import _conv_transpose2 as _conv_transpose2_dilated, _conv
from spgan_tpu.ops.upfirdn import Blur

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 30
B = 64
DT = jnp.bfloat16
key = jax.random.PRNGKey(0)


def timed(make_y, x, flops, name):
    @jax.jit
    def run(x0):
        def body(_, xc):
            y = make_y(xc)
            # channel-mean consumes EVERY output element (a bare crop would
            # let XLA dead-code-eliminate unused conv output regions), then
            # crop/pad the (B,h,w,1) map to the carry's spatial shape
            m = jnp.mean(y, axis=3, keepdims=True)
            sl = (slice(None), slice(0, x0.shape[1]), slice(0, x0.shape[2]))
            pad = [(0, max(0, a - b)) for a, b in zip(x0.shape[:3], m.shape[:3])]
            mc = jnp.pad(m, pad + [(0, 0)])[sl]
            return xc + (1e-6 * mc).astype(xc.dtype)
        return jax.lax.fori_loop(0, ITERS, body, x0).sum()

    _ = float(run(x))
    t0 = time.perf_counter()
    _ = float(run(x))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:34s} {dt*1e3:8.3f} ms   {flops/dt/1e12:7.1f} TF/s useful",
          flush=True)
    return dt


def conv_k3(h, cin, cout):
    x = jax.random.normal(key, (B, h, h, cin), DT)
    w = jax.random.normal(key, (3, 3, cin, cout), DT)
    fl = (h - 2) * (h - 2) * B * 9 * cin * cout * 2
    return timed(lambda xc: _conv(xc, w, padding=0), x, fl,
                 f"plain k3 {h}^2 {cin}->{cout}")


def convt(h, cin, cout):
    x = jax.random.normal(key, (B, h, h, cin), DT)
    w = jax.random.normal(key, (3, 3, cin, cout), DT)
    fl = 9 * (h + 1) * (h + 1) * B * cin * cout * 2
    return timed(lambda xc: _conv_transpose2_dilated(xc, w), x, fl,
                 f"convT k3s2 {h}^2 {cin}->{cout}")


def blur(h, c):
    x = jax.random.normal(key, (B, h, h, c), DT)
    bl = Blur((1.0, 2.0, 1.0), pad=(0, 0), upsample_factor=2)
    fl = (h - 2) * (h - 2) * B * 9 * c * 2
    return timed(lambda xc: bl(xc), x, fl, f"blur k3 {h}^2 c{c}")


def torgb(h, cin):
    x = jax.random.normal(key, (B, h, h, cin), DT)
    w = jax.random.normal(key, (1, 1, cin, 3), DT)
    fl = h * h * B * cin * 3 * 2
    return timed(lambda xc: _conv(xc, w, padding=0), x, fl,
                 f"toRGB k1 {h}^2 {cin}->3")


def main():
    print(f"device: {jax.devices()[0].device_kind}  B={B} dtype={DT.__name__}")
    total = 0.0
    # upsample convs 0/2/4/6: input sizes 11,17,29,53
    total += convt(11, 256, 512)
    total += convt(17, 512, 512)
    total += convt(29, 512, 512)
    total += convt(53, 512, 512)
    # blurs after crop: inputs 21,33,57,105
    total += blur(21, 512)
    total += blur(33, 512)
    total += blur(57, 512)
    total += blur(105, 512)
    # plain convs 1/3/5/7: inputs 19,31,55,103
    total += conv_k3(19, 512, 512)
    total += conv_k3(31, 512, 512)
    total += conv_k3(55, 512, 512)
    total += conv_k3(103, 512, 512)
    # ToRGBs at 17,29,53,101
    for h in (17, 29, 53, 101):
        total += torgb(h, 512)
    print(f"sum of op times: {total*1e3:.1f} ms per folded chunk "
          f"(x15 chunks = {total*15*1e3:.0f} ms per batch-16)")


if __name__ == "__main__":
    main()
