from auxpm_tpu.parallel.mesh import make_mesh  # noqa: F401
from auxpm_tpu.parallel.collectives import psum_logsumexp  # noqa: F401
