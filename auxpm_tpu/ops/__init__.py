from auxpm_tpu.ops.logsumexp import (  # noqa: F401
    blocked_logsumexp,
    logsumexp,
    masked_logsumexp,
)
