import time
import numpy as np
import jax, jax.numpy as jnp
import bobe_tpu
from bobe_tpu.ops import kernels as kr
from bobe_tpu.ops.pallas_gram import gram_masked_pallas

rng = np.random.default_rng(0)
for N in (512, 1024):
    x = jnp.asarray(rng.uniform(size=(N, 8)), jnp.float32)
    mask = (jnp.arange(N) < N - 37).astype(jnp.float32)
    ls = jnp.full((8,), 0.7, jnp.float32); amp = jnp.asarray(1.3, jnp.float32)
    gx = jax.jit(lambda x, m, l, a: kr.gram_masked("rbf", x, m, l, a, 1e-2))
    gp_ = jax.jit(lambda x, m, l, a: gram_masked_pallas("rbf", x, m, l, a, 1e-2))
    Kx = gx(x, mask, ls, amp); Kp = gp_(x, mask, ls, amp)
    err = float(jnp.max(jnp.abs(Kx - Kp)))
    def timeit(fn, *args, reps=30):
        fn(*args).block_until_ready()
        t0=time.time()
        for _ in range(reps): r = fn(*args)
        r.block_until_ready()
        return (time.time()-t0)/reps*1e3
    tx = timeit(gx, x, mask, ls, amp)
    tp = timeit(gp_, x, mask, ls, amp)
    print(f"N={N}: XLA {tx:.3f} ms, Pallas {tp:.3f} ms, max|diff|={err:.2e}")
    # matern too (correctness only at 1024)
    if N == 1024:
        gxm = jax.jit(lambda x, m, l, a: kr.gram_masked("matern", x, m, l, a, 1e-2))
        gpm_ = jax.jit(lambda x, m, l, a: gram_masked_pallas("matern", x, m, l, a, 1e-2))
        err_m = float(jnp.max(jnp.abs(gxm(x, mask, ls, amp) - gpm_(x, mask, ls, amp))))
        print(f"  matern max|diff|={err_m:.2e}")
