import time, sys
t0=time.time()
import jax, jax.numpy as jnp
print("import ok", time.time()-t0, flush=True)
t0=time.time()
d = jax.devices()
print("devices:", d, time.time()-t0, flush=True)
t0=time.time()
x = jnp.arange(1024, dtype=jnp.float32)
print("sum:", float(jnp.sum(x)), time.time()-t0, flush=True)
