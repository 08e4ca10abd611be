"""Data layer.

Capability parity with reference ``opencood/data_utils``: dataset backends
(OPV2V/V2XSet/DAIR-V2X/V2X-Sim + synthetic), fusion-timing assemblers
(early / intermediate / late, homogeneous / heterogeneous), and fixed-shape
batch collation. The reference's class-factory composition
(fusion strategy × base dataset via ``eval``) becomes an explicit
(assembler, backend) pairing in ``build_dataset``.
"""
from .builder import build_dataset

__all__ = ["build_dataset"]
