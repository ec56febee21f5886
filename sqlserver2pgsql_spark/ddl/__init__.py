from .reader import clean_statements, read_dump
from .parser import DdlParseError, parse_dump, parse_text

__all__ = ["clean_statements", "read_dump", "DdlParseError", "parse_dump", "parse_text"]
