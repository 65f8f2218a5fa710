"""``python -m tfmpc_tpu`` entry point (same surface as the console script)."""

from tfmpc_tpu.cli import main

if __name__ == "__main__":
    main()
