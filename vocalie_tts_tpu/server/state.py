"""Process-level state (uptime anchor). ref: backend/state.py"""

from vocalie_tts_tpu.server.utils import utc_now

START_TIME = utc_now()
