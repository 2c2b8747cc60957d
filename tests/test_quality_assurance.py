"""Static quality checks — analog of the reference's Aqua/ExplicitImports
group (`test/test_quality_assurance.jl`)."""

import importlib
import pkgutil

import climaseaice_jl_tpu as csi


def test_all_exports_resolve():
    for name in dir(csi):
        if name.startswith("_"):
            continue
        assert getattr(csi, name) is not None, name


def test_submodules_import_cleanly():
    import climaseaice_jl_tpu
    failures = []
    for mod in pkgutil.walk_packages(climaseaice_jl_tpu.__path__,
                                     prefix="climaseaice_jl_tpu."):
        try:
            importlib.import_module(mod.name)
        except Exception as e:  # pragma: no cover
            failures.append((mod.name, repr(e)))
    assert not failures, failures


def test_public_constructors_have_docstrings():
    for obj in (csi.RectilinearGrid, csi.LatitudeLongitudeGrid,
                csi.CurvilinearGrid, csi.TripolarGrid, csi.ImmersedBoundaryGrid,
                csi.sea_ice_model, csi.initial_state, csi.Simulation,
                csi.SeaIceMomentumEquation, csi.ElastoViscoPlasticRheology,
                csi.SlabThermodynamics, csi.FluxFunction, csi.WENO):
        assert (obj.__doc__ or "").strip(), obj


def test_reference_parameter_defaults():
    """Spot-check that headline defaults match the reference's documented
    values (`elasto_visco_plastic_rheology.jl:119-127`,
    `SeaIceThermodynamics.jl:112-128`, `sea_ice_momentum_equations.jl:67-75`)."""
    r = csi.ElastoViscoPlasticRheology()
    assert float(r.ice_compressive_strength) == 27500.0
    assert float(r.ice_compaction_hardening) == 20.0
    assert float(r.yield_curve_eccentricity) == 2.0
    assert float(r.min_relaxation_parameter) == 50.0
    assert float(r.max_relaxation_parameter) == 300.0

    pt = csi.PhaseTransitions()
    assert float(pt.density) == 917.0
    assert float(pt.reference_latent_heat) == 334e3

    d = csi.SeaIceMomentumEquation()
    assert float(d.minimum_concentration) == 1e-3
    assert float(d.minimum_mass) == 1.0
    assert d.solver.substeps == 150

    s = csi.SemiImplicitStress()
    assert float(s.rho_e) == 1026.0
    assert float(s.Cd) == 5.5e-3
