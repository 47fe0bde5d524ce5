#!/bin/bash
# Quick chip-health probe: one tiny eager op with a hard timeout.
timeout ${1:-120} python -c "
import time, jax, jax.numpy as jnp
t0=time.time()
x = float(jax.device_get(jnp.ones(()) + 1.0))
print(f'CHIP OK ({time.time()-t0:.1f}s)')
" 2>&1 | tail -1
