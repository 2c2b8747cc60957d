from .coriolis import FPlane, BetaPlane, LatitudeCoriolis
from .stresses import SemiImplicitStress, StressFunction
from .free_drift import StressBalanceFreeDrift
from .rheologies import ViscousRheology, ElastoViscoPlasticRheology
from .momentum import (SeaIceMomentumEquation, ExplicitSolver, SplitExplicitSolver,
                       ImmersedDrag, ImmersedStressBC)

__all__ = [
    "FPlane", "BetaPlane", "LatitudeCoriolis", "SemiImplicitStress", "StressBalanceFreeDrift",
    "ViscousRheology", "ElastoViscoPlasticRheology",
    "SeaIceMomentumEquation", "ExplicitSolver", "SplitExplicitSolver", "ImmersedDrag",
    "ImmersedStressBC",
]
