"""Process-lifecycle CLI: the ``vocalie-backend`` command.

Same subcommands and exit codes as the reference CLI (ref:
vocalie_backend/cli.py) so the macOS app and shell tooling work
unchanged: start / stop / status / health / install / doctor / logs,
exit codes 0 ok, 1 error, 2 not running, 3 port in use, 4 missing dep.
"""
