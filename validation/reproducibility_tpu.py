"""TPU validation of the fixed-tile reproducibility design (VERDICT r1 item 4).

Single-chip proxy for the serial-vs-distributed bitwise contract: the wide
grid (halo 19, what each wide-halo shard sees) and the plain grid (halo 5)
must produce bit-identical trajectories through the REAL Mosaic-compiled
fixed-tile kernel.  Decomposition invariance of the same kernel is asserted
on the 8-device CPU mesh in tests/test_distributed.py; this script confirms
the Mosaic (non-interpret) compilations are value-stable too.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import climaseaice_jl_tpu as csi

km = 1000.0


def build(halo):
    grid = csi.RectilinearGrid(size=(48, 128), x=(-10 * km, 10 * km),
                               y=(-20 * km, 20 * km), halo=halo, dtype="float32")
    dynamics = csi.SeaIceMomentumEquation(
        rheology=csi.ElastoViscoPlasticRheology(ice_compressive_strength=27.5),
        coriolis=csi.FPlane(f=1e-4),
        top_momentum_stress={"u": 0.01, "v": 0.01},
        bottom_momentum_stress=csi.SemiImplicitStress(),
        solver=csi.SplitExplicitSolver(substeps=8, fused="always",
                                       fixed_tiles=(8, 128)))
    model = csi.sea_ice_model(grid, dynamics=dynamics, ice_thermodynamics=None,
                              advection=csi.WENO(order=7),
                              timestepper="ForwardEuler")

    def h0(x, y):
        return 0.3 + 0.005 * (np.sin(60 * x / (20 * km))
                              + np.sin(30 * y / (40 * km)))

    return model, csi.initial_state(model, h=h0, a=1.0, u=0.05)


def build_tripolar(halo):
    """The flagship grid family: immersed TripolarGrid (fold + land) through
    the fixed-tile tiled curvilinear kernel + fixed-tile WENO-7 advection
    with array metrics — the FULL dynamics+advection step (see
    tests/test_distributed_curvilinear.py::test_fixed_tiles_tripolar_bitwise
    for the meshed assertion)."""
    from climaseaice_jl_tpu.grids import TripolarGrid
    grid = TripolarGrid((32, 96), southernmost_latitude=-70.0, halo=halo,
                        dtype="float32")
    Nx, Ny = grid.Nx, grid.Ny
    land = np.zeros((Nx, Ny), bool)
    land[:, :3] = True
    land[10:16, 80:] = True
    grid = csi.ImmersedBoundaryGrid(grid, land)
    dynamics = csi.SeaIceMomentumEquation(
        rheology=csi.ElastoViscoPlasticRheology(ice_compressive_strength=27.5),
        top_momentum_stress={"u": 0.02, "v": 0.01},
        bottom_momentum_stress=csi.SemiImplicitStress(),
        solver=csi.SplitExplicitSolver(substeps=8, halo_exchange="wide",
                                       fused="always", fixed_tiles=(8, 128)))
    model = csi.sea_ice_model(grid, dynamics=dynamics, ice_thermodynamics=None,
                              advection=csi.WENO(order=7),
                              timestepper="ForwardEuler")
    rng = np.random.default_rng(11)
    return model, csi.initial_state(model, h=0.5 + 0.1 * rng.random((Nx, Ny)),
                                    a=1.0, u=0.05)


def check(name, build_fn, halos, fields):
    m1, s1 = build_fn(halos[0])
    m2, s2 = build_fn(halos[1])
    for _ in range(5):
        s1 = csi.step(m1, s1, 60.0)
        s2 = csi.step(m2, s2, 60.0)
    I1, I2 = m1.grid.interior, m2.grid.interior
    ok = True
    for k in fields:
        a = np.asarray(I1(getattr(s1, k)))
        b = np.asarray(I2(getattr(s2, k)))
        d = np.abs(a - b).max()
        bitwise = np.array_equal(a, b)
        ok &= bitwise
        print(f"[{name}] {k}: maxdiff={d:.3e} bitwise={bitwise}")
    print(f"[{name}] RESULT:", "BITWISE" if ok else "NOT BITWISE")
    return ok


def main():
    ok = check("rectilinear halo5-vs-19", build, (5, 19),
               ("u", "v", "h", "a", "sig11", "sig12"))
    ok &= check("tripolar halo5-vs-19", build_tripolar, (5, 19),
                ("u", "v", "h", "a", "sig11", "sig12", "alpha"))
    print("RESULT:", "BITWISE" if ok else "NOT BITWISE")


if __name__ == "__main__":
    main()
