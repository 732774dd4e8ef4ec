from rlrpt_tpu.integrators.default_tracer import render_default  # noqa: F401
