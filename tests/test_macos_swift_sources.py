"""Keep the committed Swift desktop client in lockstep with the CLI.

The image has no Swift toolchain, so the sources under ``apps/macos``
cannot be compiled here. What CAN be checked from Python — and is the
part that actually breaks clients — is the wire contract: the
``CodingKeys`` each Swift Codable struct declares must name real keys
in the CLI's JSON output (tests/test_macos_client_contract.py pins the
Python side of the same contract).

Ref counterpart: apps/macos/Sources/VocalieTTS/BackendState.swift —
the reference app has no such drift guard; its struct and CLI skewed
silently when keys changed.
"""

import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
MACOS = REPO / "apps" / "macos"
BRIDGE = MACOS / "Sources" / "VocalieTTS" / "CLIBridge.swift"

# The CLI-side truth (pinned, with types, in test_macos_client_contract.py).
BACKEND_STATE_KEYS = {
    "running", "pid", "pid_alive", "host", "port",
    "started_at", "log_file", "pid_file",
}
HEALTH_KEYS = {"ok", "http_status", "latency_ms", "body", "error"}


def _coding_keys(source: str, struct_name: str) -> set[str]:
    """Extract the JSON key set a Swift Codable struct decodes.

    Handles both spellings inside ``enum CodingKeys``:
    ``case foo`` (JSON key == case name) and
    ``case fooBar = "foo_bar"`` (explicit raw value).
    """
    struct_m = re.search(
        rf"struct {struct_name}\b.*?\n}}", source, flags=re.DOTALL
    )
    assert struct_m, f"struct {struct_name} not found in {BRIDGE}"
    body = struct_m.group(0)
    enum_m = re.search(
        r"enum CodingKeys[^{]*{(.*?)\n    }", body, flags=re.DOTALL
    )
    assert enum_m, f"{struct_name} must declare explicit CodingKeys"
    keys = set()
    for line in enum_m.group(1).splitlines():
        m = re.match(r'\s*case\s+(\w+)(?:\s*=\s*"([^"]+)")?', line)
        if m:
            keys.add(m.group(2) or m.group(1))
    return keys


def test_swift_sources_exist():
    expected = {
        "CLIBridge.swift",
        "BackendSession.swift",
        "ContentView.swift",
        "VocalieTTSApp.swift",
    }
    present = {p.name for p in (MACOS / "Sources" / "VocalieTTS").glob("*.swift")}
    assert expected <= present, f"missing Swift sources: {expected - present}"
    assert (MACOS / "Package.swift").exists()
    assert (MACOS / "Scripts" / "build-app.sh").exists()


def test_backend_state_coding_keys_match_cli():
    source = BRIDGE.read_text()
    assert _coding_keys(source, "BackendState") == BACKEND_STATE_KEYS


def test_health_report_coding_keys_subset_of_cli():
    # HealthReport may decode FEWER keys than the CLI emits (JSONDecoder
    # skips unknowns) but must never name a key the CLI doesn't emit.
    source = BRIDGE.read_text()
    keys = _coding_keys(source, "HealthReport")
    assert keys <= HEALTH_KEYS, f"Swift decodes unknown keys: {keys - HEALTH_KEYS}"
    assert "ok" in keys


def test_swift_uses_supported_cli_subcommands():
    """Every `command:`/run([...]) the bridge issues must be a real CLI
    subcommand with --json support."""
    import vocalie_tts_tpu.cli.main as cli_main
    import inspect

    cli_src = inspect.getsource(cli_main)
    swift_src = BRIDGE.read_text()
    session_src = (MACOS / "Sources" / "VocalieTTS" / "BackendSession.swift").read_text()
    used = set(re.findall(r'command:\s*"(\w+)"', swift_src + session_src))
    used |= set(re.findall(r'run\(\["(\w+)", "--json"\]', swift_src))
    assert used, "no CLI subcommand usage found in Swift sources"
    for cmd in used:
        assert re.search(rf'add_parser\(\s*"{cmd}"', cli_src), (
            f"Swift client calls unknown CLI subcommand {cmd!r}"
        )
