"""Physics derived fields — the reference's bundled field recipes as
pure Column arithmetic (no UDF: everything stays in whole-stage
codegen).

Reference: ``Temperature(ElectronAbundance, InternalEnergy)`` in
src/scida/customs/arepo/extra_fields.py:36-66 — mean molecular weight
from electron abundance, then T[K] from internal energy. Registered as
a default recipe when its dependencies are present
(customs/arepo/dataset.py:108-123); here the same functions plug into
``FieldContainer.register_field``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

XH = 0.76  # hydrogen mass fraction
GAMMA = 5.0 / 3.0
M_P = 1.672622e-24  # proton mass [g]
K_B = 1.380650e-16  # Boltzmann constant [erg/K]
UNIT_ENERGY_OVER_UNIT_MASS = 1e10  # standard Gadget unit system


def mean_molecular_weight(xe: Column, xh: float = XH) -> Column:
    """mu = 4 / (1 + 3*xh + 4*xh*xe) * m_p  [g]
    (reference extra_fields.py:59)."""
    return F.lit(4.0) / (F.lit(1.0) + F.lit(3.0 * xh) + F.lit(4.0 * xh) * xe) * F.lit(M_P)


def temperature(xe: Column, u_internal: Column, *, xh: float = XH,
                gamma: float = GAMMA,
                unit_factor: float = UNIT_ENERGY_OVER_UNIT_MASS) -> Column:
    """T[K] = f * (gamma-1) * u / k_B * mu  (reference extra_fields.py:60).

    Expression-order matches the reference (and the DuckDB oracle) term
    for term, so cross-engine doubles are bit-identical.
    """
    mu = mean_molecular_weight(xe, xh)
    return F.lit(unit_factor) * F.lit(gamma - 1.0) * u_internal / F.lit(K_B) * mu
