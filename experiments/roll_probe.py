"""Probe pltpu.roll strided semantics on the real TPU.

nb2 needs out[j, i] = v[i + j + 1] from a lane-roll of the broadcast row:
row j rolled LEFT by j+1 → shift=-1, stride=-1, stride_axis=0 if the op
computes shift_j = shift + stride·j with jnp.roll sign semantics
(out[i] = x[i - shift]). Verify on device.
"""
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(x_ref, o_ref):
    v = x_ref[0]                       # [256]
    b2 = jnp.broadcast_to(v[None, :], (8, 256))
    r = pltpu.roll(b2, 1, 1, stride=1, stride_axis=0)
    o_ref[:] = r[:, 0:128]


def main():
    x = jnp.arange(256, dtype=jnp.float32)[None, :]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(x)
    out = jax.device_get(out)
    ok = True
    for j in range(8):
        for i in (0, 5, 127):
            want = (i - (j + 1)) % 256
            if out[j, i] != want:
                ok = False
                print(f"MISMATCH out[{j},{i}] = {out[j, i]} want {want}",
                      file=sys.stderr)
    print("roll probe:", "OK" if ok else "FAIL", out[:3, :5])


if __name__ == "__main__":
    main()
