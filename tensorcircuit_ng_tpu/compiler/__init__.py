"""Circuit compilation: native passes + composed pipelines (reference ``compiler/``)."""

from .simple_compiler import simple_compile, prune_pass, merge_pass, replace_u_pass
from .composed_compiler import Compiler, DefaultCompiler, default_compile

__all__ = [
    "simple_compile",
    "prune_pass",
    "merge_pass",
    "replace_u_pass",
    "Compiler",
    "DefaultCompiler",
    "default_compile",
]
