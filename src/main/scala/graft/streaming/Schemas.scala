package graft.streaming

/** Typed event/record shapes for the streaming pipelines — one case class
  * per stream the reference wires up (see SURVEY.md §1.2 / FIXTURES.md §3;
  * shapes follow /root/reference/src/main/java/samza/examples/cookbook/data/
  * PageView.java:26-46, AdClick.java:27-40, Profile.java:24-40 and
  * wikipedia/model/WikipediaFeed.java:205-216).
  *
  * `Dataset[T]` with product encoders gives compile-time safety on the
  * typed operators (mapGroupsWithState etc.); the untyped column API is
  * used wherever expressions keep the plan codegen-friendly.
  */
final case class PageView(pageId: String, userId: String, country: String, ts: java.sql.Timestamp)
final case class AdClick(pageId: String, adId: String, userId: String, ts: java.sql.Timestamp)
final case class Profile(userId: String, company: String)
final case class EnrichedPageView(userId: String, company: String, pageId: String)
final case class UserPageViews(userId: String, count: Long)
final case class StockQuote(symbol: String, close: Double)

/** Raw wikipedia feed event: one IRC line + metadata (epoch-millis time). */
final case class WikipediaFeedEvent(channel: String, raw: String, time: Long, source: String)

/** Aggregated per-window stats (edits, bytes, distinct titles, flag counts,
  * plus the all-time edit counter carried across windows). */
final case class WikipediaStats(
    windowStart: java.sql.Timestamp,
    edits: Long,
    byteDiff: Long,
    uniqueTitles: Long,
    minorEdits: Long,
    newEdits: Long,
    unpatrolledEdits: Long,
    botEdits: Long,
    specialEdits: Long,
    talkEdits: Long)
