#!/usr/bin/env pwsh
# Windows dev launcher.
#
# ref: scripts/dev-windows.ps1 — the reference starts two processes
# (FastAPI backend + Next.js frontend, each with a .run/*.pid file). Here
# the SPA is served by the backend at "/" (webui/, zero toolchain), so
# the Windows workflow is a single process managed by the same CLI that
# every other platform uses (PID file, health wait, log tail included).
param()

Set-StrictMode -Version Latest
$ErrorActionPreference = 'Stop'

$RootDir = Split-Path -Parent (Split-Path -Parent $MyInvocation.MyCommand.Path)
Set-Location $RootDir

if (-not (Get-Command python -ErrorAction SilentlyContinue)) {
    Write-Error "python >= 3.11 not found. Install Python and rerun."
    exit 1
}

$env:BACKEND_HOST = if ($env:BACKEND_HOST) { $env:BACKEND_HOST } else { '127.0.0.1' }
$env:BACKEND_PORT = if ($env:BACKEND_PORT) { $env:BACKEND_PORT } else { '8018' }
$env:VOCALIE_TRUST_LOCALHOST = if ($env:VOCALIE_TRUST_LOCALHOST) { $env:VOCALIE_TRUST_LOCALHOST } else { '1' }

python -m vocalie_tts_tpu.cli start --wait --wait-timeout 120
if ($LASTEXITCODE -ne 0) { exit $LASTEXITCODE }

$Url = "http://$($env:BACKEND_HOST):$($env:BACKEND_PORT)/"
Write-Host "Backend healthy - web UI at $Url"
Start-Process $Url
