"""Named query catalog (plans)."""

from .catalog import QuerySpec, all_specs, register, spec

__all__ = ["QuerySpec", "all_specs", "register", "spec"]
