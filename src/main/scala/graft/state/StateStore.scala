package graft.state

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Key-value state store — the reference's `dbhash` table
  * (`lib/dbhash.py:51-103`: get / set / delete / set_or_delete over
  * `(key text PRIMARY KEY, value text)`).
  *
  * State is tiny (one row per source URL / dataset), so the Spark-native
  * design is a driver-side store persisted as a single JSON file with
  * atomic replace (write-temp + ATOMIC_MOVE), not a distributed table —
  * same single-writer-per-dataset model as the reference (one pod per
  * dataset, SURVEY §3.1).
  */
trait StateStore {
  def get(key: String): Option[String]
  def set(key: String, value: String): Unit
  def delete(key: String): Unit
  def keys: Seq[String]

  /** `lib/dbhash.py:28-32` set_or_delete(None => delete). */
  def setOrDelete(key: String, value: Option[String]): Unit = value match {
    case Some(v) => set(key, v)
    case None => delete(key)
  }

  def keysWithPrefix(prefix: String): Seq[String] =
    keys.filter(_.startsWith(prefix)).sorted
}

/** In-memory store (the reference ships a dict-backed impl for tests —
  * `tests/test_dbhash.py` exercises dict/sqlite/postgres uniformly).
  */
final class MemoryStateStore extends StateStore {
  private val m = TrieMap.empty[String, String]
  def get(key: String): Option[String] = m.get(key)
  def set(key: String, value: String): Unit = m.update(key, value)
  def delete(key: String): Unit = m.remove(key)
  def keys: Seq[String] = m.keys.toSeq
}

/** File-backed store: one JSON object per file, replaced atomically so a
  * crash mid-write never corrupts state (the durability analogue of the
  * reference's Postgres transaction).
  */
final class FileStateStore(path: Path) extends StateStore {
  def this(path: String) = this(Paths.get(path))

  private def load(): collection.mutable.LinkedHashMap[String, String] = {
    val m = collection.mutable.LinkedHashMap.empty[String, String]
    if (Files.exists(path)) {
      val txt = new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
      JsonCodec.parseObject(txt).foreach { case (k, v) => m.update(k, v) }
    }
    m
  }

  private def save(m: collection.Map[String, String]): Unit = {
    if (path.getParent != null) Files.createDirectories(path.getParent)
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.write(tmp, JsonCodec.renderObject(m).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def get(key: String): Option[String] = load().get(key)
  def set(key: String, value: String): Unit = {
    val m = load(); m.update(key, value); save(m)
  }
  def delete(key: String): Unit = {
    val m = load(); m.remove(key); save(m)
  }
  def keys: Seq[String] = load().keys.toSeq
}

/** Minimal flat-string-map JSON codec (no external deps; values and keys
  * are opaque strings — exactly the dbhash contract).
  */
private[graft] object JsonCodec {
  def escape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def renderObject(m: collection.Map[String, String]): String =
    m.map { case (k, v) => s""""${escape(k)}": "${escape(v)}"""" }
      .mkString("{\n  ", ",\n  ", "\n}")

  /** Parses a flat {"k":"v",...} object (the only shape we write). */
  def parseObject(s: String): Seq[(String, String)] = {
    val out = collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    def skipWs(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def parseString(): String = {
      require(s(i) == '"', s"expected quote at $i"); i += 1
      val sb = new StringBuilder
      while (s(i) != '"') {
        if (s(i) == '\\') {
          i += 1
          s(i) match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'u' =>
              sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case c => sb += c
          }
        } else sb += s(i)
        i += 1
      }
      i += 1
      sb.toString
    }
    skipWs()
    if (i >= s.length || s(i) != '{') return out.toSeq
    i += 1
    skipWs()
    while (i < s.length && s(i) != '}') {
      val k = parseString()
      skipWs(); require(s(i) == ':', s"expected : at $i"); i += 1; skipWs()
      val v = parseString()
      out += ((k, v))
      skipWs()
      if (i < s.length && s(i) == ',') { i += 1; skipWs() }
    }
    out.toSeq
  }
}
