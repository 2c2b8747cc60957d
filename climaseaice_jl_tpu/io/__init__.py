from .checkpoint import save_checkpoint, load_checkpoint, restore_state
from .writers import NPZWriter, NetCDFWriter, FieldTimeSeriesAccumulator

__all__ = ["save_checkpoint", "load_checkpoint", "restore_state",
           "NPZWriter", "NetCDFWriter", "FieldTimeSeriesAccumulator"]
