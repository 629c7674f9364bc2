// App entry point. Regular Dock app with one main window and a
// Settings scene (ref: apps/macos/Sources/VocalieTTS/VocalieApp.swift
// — same product decisions: Dock icon rather than MenuBarExtra,
// closing the window leaves the backend running; quit via Cmd-Q).

import SwiftUI
import AppKit

@main
struct VocalieTTSApp: App {
    @NSApplicationDelegateAdaptor(AppDelegate.self) var delegate
    @StateObject private var session = BackendSession()

    var body: some Scene {
        WindowGroup("Vocalie-TTS (TPU)") {
            ContentView()
                .environmentObject(session)
                .frame(minWidth: 720, minHeight: 520)
        }
        .defaultSize(width: 960, height: 640)

        Settings {
            SettingsView()
                .environmentObject(session)
                .frame(width: 440, height: 220)
        }
    }
}

final class AppDelegate: NSObject, NSApplicationDelegate {
    func applicationDidFinishLaunching(_ notification: Notification) {
        NSApp.setActivationPolicy(.regular)
        NSApp.activate(ignoringOtherApps: true)
    }

    func applicationShouldTerminateAfterLastWindowClosed(_ sender: NSApplication) -> Bool {
        // The backend may be serving a long job; window close ≠ quit.
        false
    }
}
