from .checkpoint import save_checkpoint, load_checkpoint, restore_state, Checkpointer
from .writers import NPZWriter, NetCDFWriter, FieldTimeSeriesAccumulator

__all__ = ["save_checkpoint", "load_checkpoint", "restore_state", "Checkpointer",
           "NPZWriter", "NetCDFWriter", "FieldTimeSeriesAccumulator"]
