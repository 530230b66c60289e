from turbo_metrics_tpu.cli import run

if __name__ == "__main__":
    import sys

    sys.exit(run())
