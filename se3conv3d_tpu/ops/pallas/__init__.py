from .fused_conv import fused_basis_conv, fused_equiv_basis_conv
