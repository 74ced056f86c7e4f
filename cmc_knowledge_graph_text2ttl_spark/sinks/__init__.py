from .ttl import (
    format_nt_term,
    triple_to_ntriples,
    triples_to_nt_lines,
    write_ntriples,
    serialize_turtle,
)

__all__ = [
    "format_nt_term",
    "triple_to_ntriples",
    "triples_to_nt_lines",
    "write_ntriples",
    "serialize_turtle",
]
