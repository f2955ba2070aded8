"""Host runtime: the detector node shim, profiling, tools."""
