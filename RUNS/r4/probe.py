import time, sys
t0=time.time()
import jax, jax.numpy as jnp
print(f"import {time.time()-t0:.1f}s", flush=True)
print(jax.devices(), flush=True)
x = jnp.ones((256,256))
print(float((x@x).sum()), f"t={time.time()-t0:.1f}s", flush=True)
