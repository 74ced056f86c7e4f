from .extract import extract_text, html_to_plain_text, html_to_xhtml_text
from .run import run_workflows, explode_triples, TRIPLE_STRUCT, RESULTS_SCHEMA
from .best import select_best_workflow

__all__ = [
    "extract_text",
    "html_to_plain_text",
    "html_to_xhtml_text",
    "run_workflows",
    "explode_triples",
    "select_best_workflow",
    "TRIPLE_STRUCT",
    "RESULTS_SCHEMA",
]
