from .add2d import add2d_matmul, add2d_matmul_ad

__all__ = [
    "add2d_matmul",
    "add2d_matmul_ad",
]
