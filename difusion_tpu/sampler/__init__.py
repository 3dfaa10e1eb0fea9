from . import mesh_io, sampler, generator

__all__ = ["mesh_io", "sampler", "generator"]
