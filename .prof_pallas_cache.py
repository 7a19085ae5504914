import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
from jax.experimental import pallas as pl

def k_add(a_ref, b_ref, o_ref):
    o_ref[...] = a_ref[...] + b_ref[...]

a = jnp.ones((256, 256), jnp.float32)
out = pl.pallas_call(
    k_add, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
    grid=(2, 2),
    in_specs=[pl.BlockSpec((128, 128), lambda i, j: (i, j)),
              pl.BlockSpec((128, 128), lambda i, j: (i, j))],
    out_specs=pl.BlockSpec((128, 128), lambda i, j: (i, j)),
)(a, a)
print("cache+x64 pallas OK:", float(out[0, 0]))
