from .stepper import make_distributed_step, make_mesh

__all__ = ["make_distributed_step", "make_mesh"]
