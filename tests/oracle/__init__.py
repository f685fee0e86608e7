from tests.oracle.oracle import (  # noqa: F401
    OracleState,
    ess_update_u,
    pm_mh_step,
    slice_update_theta,
)
