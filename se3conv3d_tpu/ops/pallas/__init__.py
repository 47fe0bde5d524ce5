"""TPU Pallas kernels.

Production kernel: :mod:`fused_equiv` (fused rot-equivariant PNE conv,
auto-dispatched by ``PNEConv``); imported lazily by ``ops.pne_conv`` so
this package stays device-free at import time.
"""
