package graft.api

/** Typed records at the public API edge (SURVEY.md §1.1: the
  * reference's dataclasses `src/firefly_vcut/types.py:3-34`).
  * Internals stay DataFrame; these exist so callers get compile-time
  * field checks on results they consume.
  */
object model {

  /** `types.py:24-30` (`SongOccurrence`). */
  final case class SongOccurrence(
      song_id: Long,
      vtuber_song_id: Long,
      live_recording_archive_id: Long,
      start: Long,
      page: Int)

  /** `types.py:13-21` (`Archive`), analytic columns only. */
  final case class Archive(
      id: Long,
      vtuber_profile_id: Long,
      bvid: String,
      title: String,
      pubdate: Long,
      duration: Int,
      cover: String,
      audio_object_keys: Option[Seq[String]],
      transcript_object_key: Option[String],
      last_song_occurrence_scan: Option[java.sql.Timestamp])

  /** `types.py:3-10` (`VtuberSong`) flattened with its song. */
  final case class VtuberSong(
      id: Long,
      song_id: Long,
      vtuber_profile_id: Long,
      bvid: String,
      pubdate: Long)

  /** One flattened transcript segment (SURVEY §1.1 S2). */
  final case class TranscriptSegment(
      bvid: String,
      page: Int,
      seg_idx: Int,
      start: Double,
      text: String)

  /** One fuzzy match (scan output before attribution). */
  final case class FuzzyMatch(
      song_id: Long,
      recording_id: String,
      page: Int,
      start: Double,
      score: Double,
      matched_text: String)
}
