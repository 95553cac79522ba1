"""Cosmology metadata: h / a / redshift from dataset headers.

Mirrors the reference's CosmologyMixin (src/scida/interfaces/mixins/
cosmology.py): detection via ComovingIntegrationOn or the
Time ≈ 1/(1+z) consistency (validate, :82-132), per-dataset registry
definitions of ``h`` and ``a`` (:54-63), a ``redshift`` property, and
the snapshot↔catalog redshift consistency check on merge (reference
customs/arepo/dataset.py:190-198).
"""

from __future__ import annotations

import math
from dataclasses import dataclass


@dataclass(frozen=True)
class Cosmology:
    """Header-derived cosmological parameters."""

    h: float | None = None  # little-h (HubbleParam)
    a: float | None = None  # scale factor
    omega_m: float | None = None
    omega_l: float | None = None

    @property
    def redshift(self) -> float | None:
        if self.a is None or self.a == 0:
            return None
        return 1.0 / self.a - 1.0


def _scalar(v):
    try:  # 1-element arrays/lists → scalar (reference get_scalar)
        return v[0] if hasattr(v, "__len__") and not isinstance(v, str) else v
    except (IndexError, TypeError):
        return v


def is_cosmological(metadata: dict) -> bool:
    """Cosmology detection ladder (reference cosmology.py:82-132):
    Config.ComovingIntegrationOn == 1, else Header Time ≈ 1/(1+z),
    else Redshift present without Time."""
    from scida_spark.config import _group_attrs

    config = _group_attrs(metadata, "Config")
    if config and _scalar(config.get("ComovingIntegrationOn")) == 1:
        return True
    header = _group_attrs(metadata, "Header") or _group_attrs(metadata, "/")
    if not header:
        return False
    time, z = header.get("Time"), header.get("Redshift", header.get("cosmology:redshift"))
    if time is not None and z is not None:
        return math.isclose(
            float(_scalar(time)), 1.0 / (1.0 + float(_scalar(z))), rel_tol=1e-6
        )
    return z is not None and time is None


def cosmology_from_metadata(metadata: dict) -> Cosmology | None:
    """Extract h/a (and densities) from the Header attr group (reference
    get_cosmology_from_rawmetadata + :54-63). Returns None when no
    Header or no cosmological scalars are present."""
    from scida_spark.config import _group_attrs

    # Header group, else root attrs (flat stores: rockstar catalogs
    # keep cosmology as root-level scalars like 'cosmology:hubble' —
    # our loader demotes 0-d root datasets to the "/" attr group).
    header = _group_attrs(metadata, "Header") or _group_attrs(metadata, "/") or {}
    params = _group_attrs(metadata, "Parameters") or {}
    h = header.get("HubbleParam", params.get("HubbleParam", header.get("cosmology:hubble")))
    z = header.get("Redshift", header.get("cosmology:redshift"))
    a = header.get("Time") if z is None else 1.0 / (1.0 + float(_scalar(z)))
    om = header.get("Omega0", params.get("Omega0"))
    ol = header.get("OmegaLambda", params.get("OmegaLambda"))
    if h is None and a is None:
        return None
    return Cosmology(
        h=None if h is None else float(_scalar(h)),
        a=None if a is None else float(_scalar(a)),
        omega_m=None if om is None else float(_scalar(om)),
        omega_l=None if ol is None else float(_scalar(ol)),
    )


def define_cosmology_units(ureg, cosmo: Cosmology) -> None:
    """Inject per-dataset ``h``/``a`` into the unit registry (reference
    cosmology.py:54-63 ureg.define('h = ...'))."""
    if cosmo.h is not None:
        ureg.define("h", cosmo.h)
    if cosmo.a is not None:
        ureg.define("a", cosmo.a)


def check_redshift_consistency(
    z_snapshot: float | None, z_catalog: float | None, rtol: float = 1e-5,
    atol: float = 1e-8,
) -> None:
    """Raise on snapshot↔catalog redshift mismatch (reference
    arepo/dataset.py:190-198 np.isclose + ValueError)."""
    if z_snapshot is None or z_catalog is None:
        return
    if not math.isclose(z_snapshot, z_catalog, rel_tol=rtol, abs_tol=atol):
        raise ValueError(
            "Redshift mismatch between snapshot and catalog: "
            f"{z_snapshot:.2f} vs {z_catalog:.2f}"
        )
