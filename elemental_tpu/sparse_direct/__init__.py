"""Sparse-direct tier: fill-reducing orderings, symbolic analysis, and the
supernodal multifrontal LDL (reference ``src/lapack_like/factor/LDL/sparse``,
SURVEY §3.5)."""

from .ordering import (bisect, minimum_degree, natural_nested_dissection,
                       nested_dissection, reverse_cuthill_mckee)
from .symbolic import (LevelPlan, Supernode, SymbolicFactorization, analyze,
                       column_structures, etree, find_supernodes, postorder)
from .numeric import LDLFactorization, factor
from .facade import DistSparseLDLFactorization, SparseLDLFactorization
