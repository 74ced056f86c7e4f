from .compile import WorkflowProgram, compile_workflow, compile_workflow_file
from .interpreter import DocInterpreter, DocResult, run_document
from .remote import fetch_remote_graph, is_remote_graph, resolve_graphs

__all__ = [
    "WorkflowProgram",
    "compile_workflow",
    "compile_workflow_file",
    "DocInterpreter",
    "DocResult",
    "run_document",
    "fetch_remote_graph",
    "is_remote_graph",
    "resolve_graphs",
]
