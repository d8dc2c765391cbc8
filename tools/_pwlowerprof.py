"""cProfile the fwd pairwise-kernel lower() (client-side Mosaic pass)."""
import os as _os, sys as _sys; _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct runs
import cProfile
import io
import pstats
import time

import numpy as np
import jax
import jax.numpy as jnp

from equivariant_nn_zoo_tpu.nn.pointwise import TensorProductExpansion
from equivariant_nn_zoo_tpu.ops import Irreps
from equivariant_nn_zoo_tpu.ops.pallas.pairwise import PallasPairwiseTP

spec = "+".join(f"64x{l}e+64x{l}o" for l in range(5))
tpe = TensorProductExpansion(spec, spec, spec, "uvu", internal_weight=True)
params = tpe.init(jax.random.PRNGKey(0))
rng = np.random.default_rng(0)
dim = Irreps(spec).dim
M = 128
a = jnp.asarray(rng.normal(size=(M, dim)), jnp.bfloat16)
b = jnp.asarray(rng.normal(size=(M, dim)), jnp.bfloat16)
kern = PallasPairwiseTP(tpe, compute_dtype=jnp.bfloat16)
f = jax.jit(lambda p, x, y: kern(p, x, y))
t0 = time.time()
pr = cProfile.Profile()
pr.enable()
lo = f.lower(params, a, b)
pr.disable()
print("lower", time.time() - t0, flush=True)
s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats("tottime")
ps.print_stats(25)
print(s.getvalue())
