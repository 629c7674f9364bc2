import sys

from vocalie_tts_tpu.cli.main import main

if __name__ == "__main__":
    sys.exit(main())
