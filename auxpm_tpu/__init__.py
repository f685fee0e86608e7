"""auxpm_tpu — TPU-native auxiliary pseudo-marginal MCMC engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``matt-graham/auxiliary-pm-mcmc`` (experiment code for Murray & Graham,
"Pseudo-Marginal Slice Sampling", AISTATS 2016):

- Pseudo-marginal Metropolis-Hastings and auxiliary pseudo-marginal slice
  sampling over latent Gaussian-process models.
- Importance-sampling marginal-likelihood estimators with the auxiliary
  standard-normal draws ``u`` as explicit chain state.
- Standard HMC / NUTS and SMC baselines on the same targets.

TPU-first architecture (not a port):

- Everything is a pure function over an explicit pytree ``ChainState``.
- Transitions are jitted, ``vmap``-ed over a ``chains`` axis, and sharded over
  a ``jax.sharding.Mesh`` (axes ``('chains', 'particles')``).
- The Cython ``kernels.pyx`` Gram routines of the reference become batched
  Pallas TPU kernels (``auxpm_tpu.ops``) with pure-``jnp`` fallbacks.
- Slice-sampling bracket/shrink and MH accept loops become vmapped
  ``jax.lax.while_loop`` kernels over thousands of chains.
- Cross-device reductions (global log-sum-exp over sharded particles,
  adaptation statistics, SMC resampling) use XLA collectives
  (``psum`` / ``all_gather`` / ``ppermute``) inside ``shard_map``.
"""

__version__ = "0.1.0"

from auxpm_tpu.core.state import ChainState  # noqa: F401
from auxpm_tpu.models.base import Target  # noqa: F401
