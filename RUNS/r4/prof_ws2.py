import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

NR = 65536
NCELL = 180201
IT = 24

def timeit(name, fn, *args, n=4):
    jax.block_until_ready(fn(*args))
    t = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t) / n
    print(f"{name:46s} {dt*1e3:9.2f} ms total  {dt/IT*1e3:8.3f} ms/iter", flush=True)

print(f"# device: {jax.devices()[0]}", file=sys.stderr)
rng = np.random.default_rng(0)
cells = jnp.asarray(rng.integers(0, NCELL, NR), dtype=jnp.int32)

for W in (753, 768, 49, 64, 32):
    vals = jnp.asarray(rng.random((NR, W)), dtype=jnp.float32)
    acc = jnp.zeros((NCELL, W), dtype=jnp.float32)
    def v1(a, c, v=vals):
        def cond(s):
            return s[0] < IT
        def body(s):
            i, aa = s
            return (i + 1, aa.at[c].add(v))
        return jax.lax.while_loop(cond, body, (jnp.int32(0), a))[1]
    timeit(f"W={W:4d} while const scatter", jax.jit(v1), acc, cells)
