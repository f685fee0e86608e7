from auxpm_tpu.core.state import ChainState, init_chain_state  # noqa: F401
from auxpm_tpu.core.transition import Transition, compose, repeat  # noqa: F401
