"""Measure fixed per-iteration overhead of lax.while_loop / scan + the cost
of suspect ops (scatter, gather, refloor-like chains) inside the loop."""
import os, sys, time
import numpy as np
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
import jax
import jax.numpy as jnp

NR = 65536
NCELL = 180201
L = 32
IT = 48


def timeit(name, fn, *args, n=5):
    jax.block_until_ready(fn(*args))
    t = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t) / n
    print(f"{name:46s} {dt*1e3:9.3f} ms total  {dt/IT*1e3:8.4f} ms/iter", flush=True)


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)
    x = jnp.zeros((NR,), dtype=jnp.float32)
    xl = jnp.zeros((NR, L), dtype=jnp.float32)
    u = jnp.zeros((NCELL, L), dtype=jnp.float32)
    idx0 = jnp.asarray(rng.integers(0, NCELL, NR), dtype=jnp.int32)
    cchild = jnp.asarray(rng.integers(-1, NCELL, NCELL), dtype=jnp.int32)
    gxx = jnp.asarray(rng.random(NCELL), dtype=jnp.float32)

    def wl(body, carry):
        def cond(s):
            return s[0] < IT
        def b(s):
            return (s[0] + 1,) + body(*s[1:])
        return jax.lax.while_loop(cond, b, (jnp.int32(0),) + carry)

    # 1. trivial while: x += 1
    timeit("while x+=1 (NR,)", jax.jit(lambda x: wl(lambda x: (x + 1.0,), (x,))), x)

    # 2. trivial while with (NR,L) carry
    timeit("while x+=1 (NR,L)", jax.jit(lambda x: wl(lambda x: (x + 1.0,), (x,))), xl)

    # 3. while with cond on any(active)
    def f3(x):
        def cond(s):
            return (s[0] < IT) & jnp.any(s[1] < 1e9)
        def b(s):
            return (s[0] + 1, s[1] + 1.0)
        return jax.lax.while_loop(cond, b, (jnp.int32(0), x))
    timeit("while cond=any(x) (NR,)", jax.jit(f3), x)

    # 4. while with scatter-add into u
    def f4(u, idx):
        def body(u, idx):
            return u.at[idx].add(1.0), (idx + 1) % NCELL
        return wl(body, (u, idx))
    timeit("while scatter-add (NR,L)<-u", jax.jit(f4), u, idx0)

    # 5. while with 1 gather
    def f5(x, idx):
        def body(x, idx):
            return x + gxx[idx], (idx + 1) % NCELL
        return wl(body, (x, idx))
    timeit("while 1 gather (NR,)", jax.jit(f5), x, idx0)

    # 6. while with 8 gathers
    def f6(x, idx):
        def body(x, idx):
            s = x
            for k in range(8):
                s = s + gxx[(idx + k) % NCELL]
            return s, (idx + 1) % NCELL
        return wl(body, (x, idx))
    timeit("while 8 gathers (NR,)", jax.jit(f6), x, idx0)

    # 7. while with descend-like 4 dependent int gathers
    def f7(x, idx):
        def body(x, idx):
            c = idx
            for _ in range(4):
                c = jnp.clip(cchild[jnp.clip(c, 0, NCELL - 1)], 0, NCELL - 1)
            return x + c.astype(jnp.float32), (idx + 1) % NCELL
        return wl(body, (x, idx))
    timeit("while descend 4 dep gathers (NR,)", jax.jit(f7), x, idx0)

    # 8. while with exp on (NR, L)
    def f8(x):
        def body(x):
            return (x + jnp.exp(-x) + jnp.exp(-2 * x),)
        return wl(body, (x,))
    timeit("while 2 exps (NR,L)", jax.jit(f8), xl)

    # 9. while with u_fest-style row gather (NCELL,L)->(NR,L)
    def f9(xl, idx):
        def body(xl, idx):
            return xl + u[idx], (idx + 1) % NCELL
        return wl(body, (xl, idx))
    timeit("while row gather (NR,L)", jax.jit(f9), xl, idx0)


if __name__ == "__main__":
    main()
