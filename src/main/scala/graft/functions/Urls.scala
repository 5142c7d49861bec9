package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawl-dedup normalizer every web-corpus
  * pipeline runs before URL-level dedup (two fetches of the same page
  * differ only in scheme/host case, default port, trailing slash,
  * tracking params, param order, or fragment). Rules, applied to
  * `scheme://host[:port]/path[?query][#fragment]`:
  *
  *  - scheme and host lowercase;
  *  - default port stripped (`:443` for https, `:80` for http);
  *  - trailing `/` runs stripped from the path, empty path -> `/`;
  *  - `utm_*` tracking params dropped, the rest sorted bytewise;
  *  - fragment dropped.
  *
  * Pure codegen'd builtins (regexp + higher-order array functions) — no
  * UDF, embarrassingly parallel, so the canonical form costs one map pass
  * at any corpus size. The q106 oracle re-implements the same rules in
  * DuckDB SQL independently; the hash compare keeps the two in lockstep.
  *
  * Contract: the rules apply to absolute `scheme://host` URLs. Anything
  * else (scheme-less paths, `mailto:` forms, malformed strings) is
  * returned UNCHANGED — a crawl pipeline treats such records as
  * already-canonical keys; silently emitting a mangled `"://"` prefix
  * would corrupt the dedup key space.
  */
object Urls {

  def canonicalize(u: Column): Column = {
    val nf = regexp_replace(u, "#.*$", "") // fragment off first
    val scheme = lower(regexp_extract(nf, "^([A-Za-z]+)://", 1))
    val host0 = lower(regexp_extract(nf, "^[A-Za-z]+://([^/?#]+)", 1))
    val host = when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .otherwise(host0)
    val path0 = regexp_extract(nf, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    val deslashed = regexp_replace(path0, "/+$", "")
    val path = when(deslashed === "", lit("/")).otherwise(deslashed)
    val qs = regexp_extract(nf, "\\?([^#]*)", 1)
    val kept = array_join(
      array_sort(filter(split(qs, "&"),
        x => x =!= lit("") && !x.startsWith("utm_"))), "&")
    val canon = concat(scheme, lit("://"), host, path,
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
    when(scheme === "", u).otherwise(canon)
  }
}
