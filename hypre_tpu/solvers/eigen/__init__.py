from .lobpcg import lobpcg, LOBPCGOptions, LOBPCGResult
