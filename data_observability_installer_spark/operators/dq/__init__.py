from .testtypes import TEST_TYPES, TestSpec, parse_params
from .compiler import compile_suite, compile_suite_sql

__all__ = ["TEST_TYPES", "TestSpec", "parse_params", "compile_suite", "compile_suite_sql"]
