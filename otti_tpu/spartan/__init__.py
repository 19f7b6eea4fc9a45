"""Spartan proving stack: plain NIZK, zero-knowledge NIZK, SNARK mode."""

from . import batched, nizk, r1cs, serial, snark, spark, zknizk  # noqa: F401
from .nizk import NIZKProof  # noqa: F401
from .r1cs import R1CSShape  # noqa: F401
from .snark import SNARKProof  # noqa: F401
from .zknizk import ZKNIZKProof  # noqa: F401
