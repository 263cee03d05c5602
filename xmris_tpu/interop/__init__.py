"""Interop with external array ecosystems (xarray, netCDF)."""
