// ContentView — status header over the embedded web UI.
//
// The backend serves its SPA at "/" on the API port
// (vocalie_tts_tpu/server/app.py — no separate frontend server), so
// the WKWebView points straight at the backend root; there is no
// Next.js port to coordinate with. Capability counterpart of ref:
// apps/macos/Sources/VocalieTTS/MainWindowView.swift:1-205,
// re-designed around BackendSession.Phase (one enum drives the dot,
// the subtitle, and button availability — no per-view boolean logic).

import SwiftUI
import WebKit

struct ContentView: View {
    @EnvironmentObject var session: BackendSession

    var body: some View {
        VStack(spacing: 0) {
            header
            Divider()
            if session.phase == .healthy || session.phase == .degraded {
                WebPane(url: session.rootURL)
            } else {
                placeholder
            }
        }
        .task {
            await session.refresh()
            if session.phase != .stopped {
                session.beginPolling()
            }
        }
    }

    // MARK: - Header

    private var header: some View {
        HStack(spacing: 12) {
            Circle()
                .fill(session.phase.color)
                .frame(width: 12, height: 12)
                .overlay(Circle().stroke(session.phase.color.opacity(0.3), lineWidth: 4))
            VStack(alignment: .leading, spacing: 2) {
                Text("Vocalie-TTS (TPU)")
                    .font(.headline)
                Text(subtitle)
                    .font(.caption)
                    .foregroundStyle(.secondary)
                if let err = session.lastError {
                    Text(err)
                        .font(.caption2)
                        .foregroundStyle(.red)
                        .lineLimit(2)
                }
            }
            Spacer()
            controls
        }
        .padding(.horizontal, 16)
        .padding(.vertical, 12)
    }

    private var subtitle: String {
        switch session.phase {
        case .stopped, .starting, .stopping:
            return session.phase.label
        case .degraded, .healthy:
            guard let s = session.state else { return session.phase.label }
            var parts = ["\(s.host):\(s.port)"]
            if let pid = s.pid { parts.append("pid \(pid)") }
            if let latency = session.health?.latencyMs {
                parts.append(String(format: "health %.0f ms", latency))
            }
            return parts.joined(separator: " · ")
        }
    }

    private var controls: some View {
        HStack(spacing: 8) {
            if session.actionInFlight {
                ProgressView()
                    .controlSize(.small)
            }
            if session.phase == .stopped {
                Button("Start") { Task { await session.start() } }
                    .keyboardShortcut("r", modifiers: [.command])
            } else {
                Button("Restart") { Task { await session.restart() } }
                Button("Stop") { Task { await session.stop() } }
            }
            Button("Open in Browser") {
                NSWorkspace.shared.open(session.rootURL)
            }
            .disabled(session.phase == .stopped)
        }
        .disabled(session.actionInFlight)
    }

    private var placeholder: some View {
        VStack(spacing: 10) {
            Image(systemName: "waveform")
                .font(.system(size: 42))
                .foregroundStyle(.secondary)
            Text(session.phase == .stopped
                 ? "Backend is stopped. Start it to load the studio UI."
                 : session.phase.label)
                .foregroundStyle(.secondary)
        }
        .frame(maxWidth: .infinity, maxHeight: .infinity)
        .background(Color(nsColor: .windowBackgroundColor))
    }
}

// MARK: - Embedded web UI

/// Minimal WKWebView host. Reloads only when the root URL actually
/// changes (host/port edit), not on every health tick.
private struct WebPane: NSViewRepresentable {
    let url: URL

    func makeNSView(context: Context) -> WKWebView {
        let config = WKWebViewConfiguration()
        config.defaultWebpagePreferences.allowsContentJavaScript = true
        let view = WKWebView(frame: .zero, configuration: config)
        view.load(URLRequest(url: url))
        return view
    }

    func updateNSView(_ view: WKWebView, context: Context) {
        if view.url?.host != url.host || view.url?.port != url.port {
            view.load(URLRequest(url: url))
        }
    }
}

// MARK: - Settings (Cmd-,)

struct SettingsView: View {
    @EnvironmentObject var session: BackendSession

    var body: some View {
        Form {
            LabeledContent("Backend") {
                Text(session.rootURL.absoluteString)
                    .font(.caption.monospaced())
                    .textSelection(.enabled)
            }
            LabeledContent("Phase") {
                Text(session.phase.label)
            }
            LabeledContent("Log file") {
                Text(session.state?.logFile ?? "—")
                    .font(.caption.monospaced())
                    .textSelection(.enabled)
            }
            if let checked = session.lastPolled {
                LabeledContent("Last polled") {
                    Text(checked, style: .time)
                }
            }
        }
        .padding()
    }
}
