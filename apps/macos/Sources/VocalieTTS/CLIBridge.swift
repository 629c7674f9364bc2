// CLIBridge — the only place the app touches the Python side.
//
// All lifecycle work (spawn the aiohttp server, PID files, health
// probes) lives in the `vocalie-backend` CLI; the app shells out and
// decodes JSON. The wire shapes below are the frozen desktop-client
// contract pinned by tests/test_macos_client_contract.py: the eight
// BackendState keys and the HealthReport keys must decode exactly.
// (Capability counterpart of ref: apps/macos/Sources/VocalieTTS/
// BackendManager.swift:1-124 + BackendState.swift — re-designed as a
// stateless value-type bridge; state lives in BackendSession.)

import Foundation

/// JSON emitted by `vocalie-backend status|start|stop --json`
/// (vocalie_tts_tpu/cli/runstate.py BackendState.to_json).
struct BackendState: Codable, Equatable, Sendable {
    var running: Bool
    var pid: Int?
    var pidAlive: Bool
    var host: String
    var port: Int
    var startedAt: Double?
    var logFile: String
    var pidFile: String

    enum CodingKeys: String, CodingKey {
        case running
        case pid
        case pidAlive = "pid_alive"
        case host
        case port
        case startedAt = "started_at"
        case logFile = "log_file"
        case pidFile = "pid_file"
    }

    var rootURL: URL? {
        URL(string: "http://\(host):\(port)/")
    }
}

/// JSON emitted by `vocalie-backend health --json`
/// (vocalie_tts_tpu/cli/main.py cmd_health). Decoded as JSON rather
/// than substring-matched: the Python side keeps `"ok": true`
/// formatting stable for legacy clients, but we don't depend on it.
struct HealthReport: Codable, Equatable, Sendable {
    var ok: Bool
    var httpStatus: Int?
    var latencyMs: Double?
    var error: String?
    // `body` (the raw /v1/health JSON object) is deliberately not
    // decoded — JSONDecoder skips unknown keys, and the app only
    // renders the scalar fields.

    enum CodingKeys: String, CodingKey {
        case ok
        case httpStatus = "http_status"
        case latencyMs = "latency_ms"
        case error
    }
}

enum CLIBridgeError: LocalizedError {
    case interpreterNotFound(String)
    case undecodable(command: String, stdout: String, stderr: String)

    var errorDescription: String? {
        switch self {
        case .interpreterNotFound(let path):
            return "Python interpreter not found at \(path). "
                + "Set VOCALIE_PYTHON or install the backend venv."
        case .undecodable(let command, let stdout, let stderr):
            let detail = stderr.isEmpty ? stdout : stderr
            return "vocalie-backend \(command) returned undecodable "
                + "output: \(detail.prefix(240))"
        }
    }
}

/// Stateless subprocess runner for the Python CLI. Unlike the usual
/// "manager object" shape, this is a value type: callers own all
/// state, the bridge only knows how to run one command and decode
/// one payload.
struct CLIBridge: Sendable {
    /// How the CLI is invoked. Two supported forms:
    ///  - a `vocalie-backend` console script (installed wheel), or
    ///  - `<python> -m vocalie_tts_tpu.cli` against a source checkout.
    /// Resolution order: VOCALIE_BACKEND_CLI (script path) →
    /// VOCALIE_PYTHON (interpreter) → repo-relative .venv/bin/python →
    /// /usr/bin/env python3.
    let launchPath: String
    let baseArguments: [String]
    let workingDirectory: URL?

    static func resolve(environment: [String: String] = ProcessInfo.processInfo.environment) -> CLIBridge {
        if let script = environment["VOCALIE_BACKEND_CLI"], !script.isEmpty {
            return CLIBridge(launchPath: script, baseArguments: [], workingDirectory: nil)
        }
        let repoRoot = Self.repoRoot()
        let python: String
        if let override = environment["VOCALIE_PYTHON"], !override.isEmpty {
            python = override
        } else if let root = repoRoot,
                  FileManager.default.isExecutableFile(atPath: root.appendingPathComponent(".venv/bin/python").path) {
            python = root.appendingPathComponent(".venv/bin/python").path
        } else {
            python = "/usr/bin/env"
        }
        var args: [String] = python == "/usr/bin/env" ? ["python3"] : []
        args += ["-m", "vocalie_tts_tpu.cli"]
        return CLIBridge(launchPath: python, baseArguments: args, workingDirectory: repoRoot)
    }

    /// Walk up from this source file to the repo root (apps/macos/
    /// Sources/VocalieTTS → four levels up). Only meaningful for
    /// source-checkout builds; bundled builds use the env overrides.
    private static func repoRoot() -> URL? {
        let candidate = URL(fileURLWithPath: #filePath)
            .deletingLastPathComponent()   // CLIBridge.swift → VocalieTTS/
            .deletingLastPathComponent()   // → Sources/
            .deletingLastPathComponent()   // → macos/
            .deletingLastPathComponent()   // → apps/
            .deletingLastPathComponent()   // → repo root
        return FileManager.default.fileExists(atPath: candidate.appendingPathComponent("pyproject.toml").path)
            ? candidate : nil
    }

    struct Output: Sendable {
        let stdout: String
        let stderr: String
        let exitCode: Int32
    }

    /// Run one CLI subcommand. Never throws on a non-zero exit code —
    /// the CLI uses exit codes 0-4 as part of its contract (2 = not
    /// running is a normal answer, not an error).
    func run(_ arguments: [String]) async throws -> Output {
        let launchPath = self.launchPath
        let fullArgs = baseArguments + arguments
        let cwd = workingDirectory
        if !launchPath.hasPrefix("/usr/bin/env"),
           !FileManager.default.isExecutableFile(atPath: launchPath) {
            throw CLIBridgeError.interpreterNotFound(launchPath)
        }
        return try await withCheckedThrowingContinuation { continuation in
            let process = Process()
            process.executableURL = URL(fileURLWithPath: launchPath)
            process.arguments = fullArgs
            if let cwd { process.currentDirectoryURL = cwd }
            let out = Pipe()
            let err = Pipe()
            process.standardOutput = out
            process.standardError = err
            process.terminationHandler = { finished in
                let stdoutData = (try? out.fileHandleForReading.readToEnd()) ?? Data()
                let stderrData = (try? err.fileHandleForReading.readToEnd()) ?? Data()
                continuation.resume(returning: Output(
                    stdout: String(data: stdoutData, encoding: .utf8) ?? "",
                    stderr: String(data: stderrData, encoding: .utf8) ?? "",
                    exitCode: finished.terminationStatus
                ))
            }
            do {
                try process.run()
            } catch {
                continuation.resume(throwing: error)
            }
        }
    }

    func state(command: String, extraArguments: [String] = []) async throws -> BackendState {
        let output = try await run([command, "--json"] + extraArguments)
        guard let data = output.stdout.data(using: .utf8),
              let state = try? JSONDecoder().decode(BackendState.self, from: data) else {
            throw CLIBridgeError.undecodable(command: command, stdout: output.stdout, stderr: output.stderr)
        }
        return state
    }

    func health() async -> HealthReport {
        guard let output = try? await run(["health", "--json"]),
              let data = output.stdout.data(using: .utf8),
              let report = try? JSONDecoder().decode(HealthReport.self, from: data) else {
            return HealthReport(ok: false, httpStatus: nil, latencyMs: nil,
                                error: "health probe failed")
        }
        return report
    }
}
