from cavp_tpu.ops.interp import interpolate_bilinear, interpolate_nearest

__all__ = ["interpolate_bilinear", "interpolate_nearest"]
