from weaksuppointcloudseg_tpu.utils.tools import onehot_encode, printout, Summary
from weaksuppointcloudseg_tpu.utils.checkpoint import (
    save_checkpoint,
    restore_checkpoint,
    CheckpointManager,
)

__all__ = [
    "onehot_encode",
    "printout",
    "Summary",
    "save_checkpoint",
    "restore_checkpoint",
    "CheckpointManager",
]
