from auxpm_tpu.utils.diagnostics import effective_sample_size, potential_scale_reduction  # noqa: F401
