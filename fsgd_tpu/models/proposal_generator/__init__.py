from .rpn import RPN, StandardRPNHead

__all__ = ["RPN", "StandardRPNHead"]
from .rrpn import RRPN
