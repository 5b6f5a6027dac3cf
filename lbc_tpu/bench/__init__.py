"""Benchmark harness (reference: benchmark/)."""
from .report import collect_results, format_table
from .runner import run_benchmark
from .suites import ALL_SUITES, SuiteConfig, get_suites, make_suite

__all__ = ['ALL_SUITES', 'SuiteConfig', 'get_suites', 'make_suite',
           'run_benchmark', 'collect_results', 'format_table']
