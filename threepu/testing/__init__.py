"""Parity tooling: run the actual reference implementation on torch-CPU
next to threepu and compare numbers."""

from threepu.testing.reference_bridge import (
    install_reference_stubs,
    import_reference,
    make_reference_net,
    load_params_into_reference,
)

__all__ = [
    "install_reference_stubs",
    "import_reference",
    "make_reference_net",
    "load_params_into_reference",
]
