from .compile import WorkflowProgram, compile_workflow, compile_workflow_file
from .interpreter import DocInterpreter, DocResult, run_document

__all__ = [
    "WorkflowProgram",
    "compile_workflow",
    "compile_workflow_file",
    "DocInterpreter",
    "DocResult",
    "run_document",
]
