from .baker import (DispatchChain, DispatchConfigDesc, GpuBakeFlags, Pass,
                    Pipeline, PostDispatchInfo, PreDispatchInfo,
                    ScratchMemoryBudget)

__all__ = ["DispatchChain", "DispatchConfigDesc", "GpuBakeFlags", "Pass",
           "Pipeline", "PostDispatchInfo", "PreDispatchInfo",
           "ScratchMemoryBudget"]
