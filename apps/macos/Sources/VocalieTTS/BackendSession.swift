// BackendSession — the app's one source of truth.
//
// Re-design note (capability counterpart of ref: apps/macos/Sources/
// VocalieTTS/{BackendManager,HealthMonitor,AppController}.swift): the
// reference splits lifecycle, polling, and in-flight bookkeeping over
// three ObservableObjects that views must keep consistent by hand.
// Here a single explicit state machine owns everything: `phase` is
// derived in exactly one place (`reconcile()`), the poll loop is a
// structured-concurrency Task (cancelled with the session, no Timer
// retain cycles), and user actions serialize through `transition(_:)`
// so a double-clicked Start can never interleave with a Stop.

import Foundation
import SwiftUI

@MainActor
final class BackendSession: ObservableObject {

    /// Every state the UI can render. `degraded` = process is up but
    /// /v1/health has not (yet) reported ok — the amber light.
    enum Phase: Equatable {
        case stopped
        case starting
        case degraded
        case healthy
        case stopping

        var label: String {
            switch self {
            case .stopped: return "Stopped"
            case .starting: return "Starting…"
            case .degraded: return "Running (not healthy)"
            case .healthy: return "Healthy"
            case .stopping: return "Stopping…"
            }
        }

        var color: Color {
            switch self {
            case .stopped: return .gray
            case .starting, .stopping: return .yellow
            case .degraded: return .orange
            case .healthy: return .green
            }
        }
    }

    @Published private(set) var phase: Phase = .stopped
    @Published private(set) var state: BackendState?
    @Published private(set) var health: HealthReport?
    @Published private(set) var lastError: String?
    @Published private(set) var lastPolled: Date?

    /// True while start/stop/restart runs; buttons disable on it.
    var actionInFlight: Bool {
        phase == .starting || phase == .stopping
    }

    var rootURL: URL {
        state?.rootURL ?? URL(string: "http://127.0.0.1:8018/")!
    }

    private let bridge: CLIBridge
    private var pollTask: Task<Void, Never>?
    private let pollInterval: Duration

    init(bridge: CLIBridge = .resolve(), pollInterval: Duration = .seconds(5)) {
        self.bridge = bridge
        self.pollInterval = pollInterval
    }

    deinit {
        pollTask?.cancel()
    }

    // MARK: - Lifecycle actions (each is a full transition)

    func start() async {
        await transition(.starting) {
            try await self.bridge.state(command: "start", extraArguments: ["--wait"])
        }
        beginPolling()
    }

    func stop() async {
        pollTask?.cancel()
        pollTask = nil
        await transition(.stopping) {
            try await self.bridge.state(command: "stop")
        }
        health = nil
        reconcile()
    }

    func restart() async {
        await stop()
        await start()
    }

    /// One immediate status+health round; also the poll-loop body.
    func refresh() async {
        do {
            state = try await bridge.state(command: "status")
            lastError = nil
        } catch {
            lastError = error.localizedDescription
        }
        if state?.running == true {
            health = await bridge.health()
        } else {
            health = nil
        }
        lastPolled = Date()
        reconcile()
    }

    func beginPolling() {
        pollTask?.cancel()
        pollTask = Task { [weak self] in
            while !Task.isCancelled {
                await self?.refresh()
                guard let interval = self?.pollInterval else { return }
                try? await Task.sleep(for: interval)
            }
        }
    }

    // MARK: - Internals

    /// Run `action` while holding an intermediate phase, then settle
    /// on whatever the CLI reports. All mutations funnel through here
    /// so the phase can never skew from the underlying state.
    private func transition(_ intermediate: Phase,
                            action: @escaping () async throws -> BackendState) async {
        guard !actionInFlight else { return }
        phase = intermediate
        lastError = nil
        do {
            state = try await action()
        } catch {
            lastError = error.localizedDescription
        }
        if intermediate == .starting {
            health = await bridge.health()
        }
        reconcile()
    }

    /// THE phase derivation — the only place `phase` is computed from
    /// observed state, so every code path agrees on what the light
    /// color means.
    private func reconcile() {
        guard let state, state.running else {
            phase = .stopped
            return
        }
        phase = (health?.ok == true) ? .healthy : .degraded
    }
}
