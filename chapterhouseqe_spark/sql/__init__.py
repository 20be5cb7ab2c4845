"""SQL front-end: ``read_files`` resolution + reference-semantics expressions."""

from chapterhouseqe_spark.sql.parser import parse_expression, parse_select
from chapterhouseqe_spark.sql.compiler import compile_expression, project
from chapterhouseqe_spark.sql.read_files import rewrite_read_files

__all__ = [
    "parse_expression",
    "parse_select",
    "compile_expression",
    "project",
    "rewrite_read_files",
]
