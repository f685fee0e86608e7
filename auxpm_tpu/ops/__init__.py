from auxpm_tpu.ops.logsumexp import (  # noqa: F401
    logsumexp,
    masked_logsumexp,
    streaming_logsumexp,
)
