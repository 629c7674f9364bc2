"""Chunk authoring endpoints: snapshot / preview / marker
(ref: backend/routes/chunks.py)."""

from __future__ import annotations

from typing import List

from vocalie_tts_tpu.server.schemas import (
    ChunkMarkerRequest,
    ChunkMarkerResponse,
    ChunkPreviewRequest,
    ChunkPreviewResponse,
    ChunkSnapshotRequest,
    ChunkSnapshotResponse,
    UIStateChunkPreview,
)
from vocalie_tts_tpu.server.web import ApiError, Router, read_validated_body
from vocalie_tts_tpu.text import (
    MANUAL_CHUNK_MARKER,
    ChunkInfo,
    SpeechSegment,
    count_words,
    estimate_duration,
    normalize_text,
    parse_manual_chunks,
    render_clean_text,
    render_clean_text_from_segments,
)

router = Router(prefix="/v1")


def _single_chunk(text: str) -> List[ChunkInfo]:
    clean = render_clean_text(text).strip()
    if not clean:
        return []
    return [
        ChunkInfo(
            segments=[SpeechSegment("text", clean)],
            sentence_count=sum(1 for ch in clean if ch in ".!?"),
            char_count=len(clean),
            word_count=count_words(clean),
            comma_count=clean.count(","),
            estimated_duration=estimate_duration(clean),
            reason="single",
            boundary_kind="single",
            pivot=False,
            ends_with_suspended=clean.rstrip().endswith((",", ";", ":")),
            oversize_sentence=False,
            warnings=[],
        )
    ]


def _marker_indices(snapshot_text: str) -> List[int]:
    indices = []
    start = 0
    while True:
        idx = snapshot_text.find(MANUAL_CHUNK_MARKER, start)
        if idx == -1:
            break
        indices.append(idx)
        start = idx + len(MANUAL_CHUNK_MARKER)
    return indices


def _insert_marker(snapshot_text: str, position: int) -> str:
    position = max(0, min(position, len(snapshot_text)))
    return (
        f"{snapshot_text[:position]}\n{MANUAL_CHUNK_MARKER}\n{snapshot_text[position:]}"
    )


def _remove_marker(snapshot_text: str, position: int) -> str:
    indices = _marker_indices(snapshot_text)
    if not indices:
        return snapshot_text
    target = min(indices, key=lambda idx: abs(idx - position))
    start, end = target, target + len(MANUAL_CHUNK_MARKER)
    # eat the surrounding newlines the insert added
    if start > 0 and snapshot_text[start - 1] == "\n":
        start -= 1
    if end < len(snapshot_text) and snapshot_text[end : end + 1] == "\n":
        end += 1
    return snapshot_text[:start] + snapshot_text[end:]


def _chunks_from_ranges(snapshot_text: str, ranges) -> List[ChunkInfo]:
    chunks: List[ChunkInfo] = []
    for entry in ranges:
        if entry.start < 0 or entry.end > len(snapshot_text) or entry.start >= entry.end:
            raise ApiError(400, "invalid_chunk_range")
        chunk_text = snapshot_text[entry.start : entry.end]
        clean = render_clean_text(chunk_text)
        chunks.append(
            ChunkInfo(
                segments=[SpeechSegment("text", chunk_text)],
                sentence_count=sum(1 for ch in clean if ch in ".!?"),
                char_count=len(chunk_text),
                word_count=count_words(clean),
                comma_count=clean.count(","),
                estimated_duration=estimate_duration(clean),
                reason="manual_range",
                boundary_kind="manual_range",
                pivot=False,
                ends_with_suspended=clean.rstrip().endswith((",", ";", ":")),
                oversize_sentence=False,
                warnings=[],
            )
        )
    return chunks


def _preview_payload(chunks: List[ChunkInfo]) -> List[UIStateChunkPreview]:
    return [
        UIStateChunkPreview(
            index=idx,
            text=render_clean_text_from_segments(chunk.segments).strip(),
            est_duration_s=float(chunk.estimated_duration),
            word_count=int(chunk.word_count),
        )
        for idx, chunk in enumerate(chunks, start=1)
    ]


@router.post("/chunks/snapshot")
async def snapshot_chunks(request) -> ChunkSnapshotResponse:
    body = await read_validated_body(request, ChunkSnapshotRequest)
    source = body.text_interpreted if body.text_interpreted is not None else body.text_adjusted
    return ChunkSnapshotResponse(snapshot_text=normalize_text(source or ""))


@router.post("/chunks/preview")
async def preview_chunks(request) -> ChunkPreviewResponse:
    body = await read_validated_body(request, ChunkPreviewRequest)
    snapshot_text = body.snapshot_text or ""
    if body.markers:
        for pos in sorted(set(body.markers), reverse=True):
            snapshot_text = _insert_marker(snapshot_text, int(pos))
    if body.ranges:
        chunks = _chunks_from_ranges(snapshot_text, body.ranges)
        return ChunkPreviewResponse(chunks=_preview_payload(chunks))
    chunks, _count = parse_manual_chunks(snapshot_text, marker=MANUAL_CHUNK_MARKER)
    if not chunks:
        chunks = _single_chunk(snapshot_text)
    return ChunkPreviewResponse(chunks=_preview_payload(chunks))


@router.post("/chunks/apply_marker")
async def apply_marker(request) -> ChunkMarkerResponse:
    body = await read_validated_body(request, ChunkMarkerRequest)
    if body.action == "insert":
        updated = _insert_marker(body.snapshot_text or "", int(body.position))
    elif body.action == "remove":
        updated = _remove_marker(body.snapshot_text or "", int(body.position))
    else:
        raise ApiError(400, "invalid_action")
    return ChunkMarkerResponse(
        snapshot_text_updated=updated, markers_updated=_marker_indices(updated)
    )
