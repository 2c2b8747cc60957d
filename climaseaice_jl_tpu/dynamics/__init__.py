from .coriolis import FPlane, BetaPlane
from .stresses import SemiImplicitStress, StressFunction
from .free_drift import StressBalanceFreeDrift
from .rheologies import ViscousRheology, ElastoViscoPlasticRheology
from .momentum import (SeaIceMomentumEquation, ExplicitSolver, SplitExplicitSolver,
                       ImmersedDrag, ImmersedStressBC)

__all__ = [
    "FPlane", "BetaPlane", "SemiImplicitStress", "StressBalanceFreeDrift",
    "ViscousRheology", "ElastoViscoPlasticRheology",
    "SeaIceMomentumEquation", "ExplicitSolver", "SplitExplicitSolver", "ImmersedDrag",
    "ImmersedStressBC",
]
