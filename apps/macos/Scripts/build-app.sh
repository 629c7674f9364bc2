#!/usr/bin/env bash
# Build Vocalie-TTS (TPU).app from the SwiftPM package.
# macOS-only (requires Xcode command-line tools); this image has no
# Swift toolchain, so CI validates the Swift sources' CLI/HTTP
# contracts from the Python side instead
# (tests/test_macos_client_contract.py).
set -euo pipefail

cd "$(dirname "$0")/.."

APP_NAME="Vocalie-TTS (TPU)"
BUNDLE_ID="com.vocalie.tts.tpu"
BUILD_DIR=".build/release"
APP_DIR=".build/${APP_NAME}.app"

swift build -c release

rm -rf "${APP_DIR}"
mkdir -p "${APP_DIR}/Contents/MacOS"
cp "${BUILD_DIR}/vocalie-tts" "${APP_DIR}/Contents/MacOS/${APP_NAME}"

cat > "${APP_DIR}/Contents/Info.plist" <<PLIST
<?xml version="1.0" encoding="UTF-8"?>
<!DOCTYPE plist PUBLIC "-//Apple//DTD PLIST 1.0//EN"
  "http://www.apple.com/DTDs/PropertyList-1.0.dtd">
<plist version="1.0">
<dict>
  <key>CFBundleExecutable</key><string>${APP_NAME}</string>
  <key>CFBundleIdentifier</key><string>${BUNDLE_ID}</string>
  <key>CFBundleName</key><string>${APP_NAME}</string>
  <key>CFBundlePackageType</key><string>APPL</string>
  <key>CFBundleShortVersionString</key><string>1.0</string>
  <key>LSMinimumSystemVersion</key><string>13.0</string>
  <key>NSHighResolutionCapable</key><true/>
</dict>
</plist>
PLIST

echo "Built ${APP_DIR}"
