from . import kernels, neighbors, density, viscosity, transport, integration, monitors

__all__ = ["kernels", "neighbors", "density", "viscosity", "transport",
           "integration", "monitors"]
