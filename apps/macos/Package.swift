// swift-tools-version: 5.9
// VocalieTTS-TPU desktop shell. One executable target: the app is a
// thin client of the Python CLI + HTTP API (the same two contracts
// replay-tested in tests/test_macos_client_contract.py), so there is
// nothing to modularize.
//
// Capability counterpart of the reference macOS app (ref:
// apps/macos/Package.swift) — re-designed, see Sources/VocalieTTS/.

import PackageDescription

let package = Package(
    name: "VocalieTTS",
    platforms: [
        .macOS(.v13)
    ],
    products: [
        .executable(name: "vocalie-tts", targets: ["VocalieTTS"])
    ],
    targets: [
        .executableTarget(
            name: "VocalieTTS",
            path: "Sources/VocalieTTS"
        )
    ]
)
