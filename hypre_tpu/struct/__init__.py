from .grid import StructGrid
from .matrix import StructMatrix, struct_matvec
from .vector import struct_inner_prod
