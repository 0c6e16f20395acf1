"""Glue micro-benchmark: what does assembling a [8, n] field pack cost
on the chip, and which construction is cheapest?

STATUS: live instrument (r4). The chip ablation put the fast step's
"glue" floor (everything that is not a pair-pass tile) at 7.6 ms/step;
the isolated pack build measured 8.2 ms. Candidates:

  A  jnp.stack(fields, 0)                (shipped _pack)
  B  concatenate of (1, n) reshapes
  C  [8, n] buffer + .at[i].set rows
  D  Pallas packer (sublane concat in registers, chunked grid)

Each timed as its own jit with a dispatch-baseline subtraction.

Run on the real chip:  python scripts/r4_glue_micro.py
"""
import os
os.environ["JAX_PLATFORMS"] = ""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 232192  # ~worm n_pad
ROWS = 8
CH = 32768


def timeit(name, fn, args, reps=50):
    f = jax.jit(fn)
    out = f(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    ms = (time.time() - t0) / reps * 1e3
    print(f"{name:44s} {ms:8.3f} ms", flush=True)
    return ms


def pallas_pack(fields):
    n = fields[0].shape[0]
    grid = n // CH

    def kernel(*refs):
        ins = refs[:ROWS]
        (out,) = refs[ROWS:]
        out[...] = jnp.concatenate([r[...] for r in ins], axis=0)

    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((1, CH), lambda g: (0, g))
                  for _ in range(ROWS)],
        out_specs=pl.BlockSpec((ROWS, CH), lambda g: (0, g)),
        out_shape=jax.ShapeDtypeStruct((ROWS, n), jnp.float32),
    )(*[f.reshape(1, n) for f in fields])


def main():
    dev = jax.devices()[0]
    print(f"backend: {jax.default_backend()} ({dev}); n={N}", flush=True)
    rng = np.random.default_rng(0)
    fields = [jnp.asarray(rng.standard_normal(N), jnp.float32)
              for _ in range(ROWS)]

    base = timeit("dispatch baseline (x + 1.0 on one row)",
                  lambda x: x + 1.0, (fields[0],))

    timeit("A jnp.stack(fields, 0)",
           lambda *f: jnp.stack(list(f), 0), fields)
    timeit("B concat of (1,n) reshapes",
           lambda *f: jnp.concatenate([x.reshape(1, -1) for x in f], 0),
           fields)

    def at_set(*f):
        out = jnp.zeros((ROWS, N), jnp.float32)
        for i, x in enumerate(f):
            out = out.at[i].set(x)
        return out

    timeit("C zeros.at[i].set rows", at_set, fields)
    timeit("D pallas packer (sublane concat)",
           lambda *f: pallas_pack(list(f)), fields)

    # how much does a CONSUMER amortize? stack feeding a row-sum
    timeit("A + row reduction (fusion probe)",
           lambda *f: jnp.stack(list(f), 0).sum(axis=1), fields)
    print(f"(baseline {base:.3f} ms includes one dispatch + a 0.9 MB "
          "elementwise op)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
