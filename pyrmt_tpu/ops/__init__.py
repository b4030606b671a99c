from pyrmt_tpu.ops import fd, interp  # noqa: F401
