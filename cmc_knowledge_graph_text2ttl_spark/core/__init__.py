from .errors import ProcessorException, WorkflowCompileError
from .terms import IriNode, LitNode, TripleOut, XSD

__all__ = [
    "ProcessorException",
    "WorkflowCompileError",
    "IriNode",
    "LitNode",
    "TripleOut",
    "XSD",
]
