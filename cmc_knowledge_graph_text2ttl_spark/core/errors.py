"""Engine exceptions.

``ProcessorException`` mirrors the failure surface of the reference
interpreter (text_to_turtle_processor.py:27-31): any workflow-level
error raised while interpreting a document. The Spark layer catches it
per document and records an ``error`` column instead of failing the job.
"""


class ProcessorException(Exception):
    """A document-level workflow execution error."""


class WorkflowCompileError(Exception):
    """A driver-side workflow validation/compilation error."""
