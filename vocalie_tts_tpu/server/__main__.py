"""``python -m vocalie_tts_tpu.server [--host H] [--port P]``"""

from __future__ import annotations

import argparse

from vocalie_tts_tpu.server.app import main

if __name__ == "__main__":
    parser = argparse.ArgumentParser(prog="vocalie-tts-tpu-server")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8018)
    args = parser.parse_args()
    main(host=args.host, port=args.port)
