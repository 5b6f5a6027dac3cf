"""Success-rate tables across runs/seeds
(reference: view_benchmark_results.py).

Usage: python -m lbc_tpu.cli.view_benchmark_results benchmark_results/
"""
import sys

from ..bench import collect_results, format_table


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else 'benchmark_results'
    res = collect_results(root)
    if res.empty:
        print('no summary.csv files under', root)
        return
    print(format_table(res))


if __name__ == '__main__':
    main()
