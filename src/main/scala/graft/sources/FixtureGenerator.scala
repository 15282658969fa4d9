package graft.sources

import graft.core.{Address, User}

/** G1: deterministic fixture generator reproducing the reference producer's
  * wire shapes (`/root/reference/user-generator.py:11-37,45-81`): `nUsers`
  * users, each followed by exactly `addressesPerUser` addresses (the
  * producer's `randint(3,3)`), JSON-encoded with the producer's timestamp
  * format (microseconds, no-colon offset). Seeded → byte-stable goldens.
  */
object FixtureGenerator {

  private val genres = Seq("M", "F", "O")
  private val states = Seq("Illinois", "Bahia", "Bavaria", "Kyoto", "Cusco")
  private val countries = Seq("Brazil", "Germany", "Japan", "Peru", "USA")

  final case class Fixture(user: User, addresses: Seq[Address])

  def fixtures(seed: Long = 42L, nUsers: Int = 10, addressesPerUser: Int = 3): Seq[Fixture] = {
    val rng = new scala.util.Random(seed)
    def uuid(): String = new java.util.UUID(rng.nextLong(), rng.nextLong()).toString
    (0 until nUsers).map { i =>
      val id = uuid()
      val ts = java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2026, 1, 1, 0, 0, 0)
          .plusSeconds(rng.nextInt(86400).toLong))
      val user = User(id, s"User $i", s"user$i@example.org",
        genres(rng.nextInt(genres.length)), ts)
      val addrs = (0 until addressesPerUser).map { j =>
        val k = rng.nextInt(states.length)
        Address(id, s"$j Main St\nApt ${rng.nextInt(100)}", s"City $k",
          states(k), f"${rng.nextInt(100000)}%05d", countries(rng.nextInt(countries.length)))
      }
      Fixture(user, addrs)
    }
  }

  /** Producer's `registerDate` format (`user-generator.py:22`). */
  def wireTimestamp(ts: java.sql.Timestamp): String =
    ts.toInstant.atOffset(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSSZ"))

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def userJson(u: User): String =
    s"""{"id":${jstr(u.id)},"name":${jstr(u.name)},"email":${jstr(u.email)},""" +
      s""""genre":${jstr(u.genre)},"registerDate":${jstr(wireTimestamp(u.registerDate))}}"""

  def addressJson(a: Address): String =
    s"""{"userId":${jstr(a.userId)},"address":${jstr(a.address)},"city":${jstr(a.city)},""" +
      s""""state":${jstr(a.state)},"zipCode":${jstr(a.zipCode)},"country":${jstr(a.country)}}"""

  /** Write newline-delimited JSON under `<dir>/user` and `<dir>/address`
    * (the `FileIngestSource` layout). Message order inside each file is the
    * producer's: each user precedes its addresses.
    */
  def writeFiles(dir: String, seed: Long = 42L, nUsers: Int = 10,
      addressesPerUser: Int = 3): Seq[Fixture] = {
    val fs = fixtures(seed, nUsers, addressesPerUser)
    val base = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(base.resolve("user"))
    java.nio.file.Files.createDirectories(base.resolve("address"))
    java.nio.file.Files.write(base.resolve("user/users.json"),
      fs.map(f => userJson(f.user)).mkString("", "\n", "\n").getBytes)
    java.nio.file.Files.write(base.resolve("address/addresses.json"),
      fs.flatMap(_.addresses.map(addressJson)).mkString("", "\n", "\n").getBytes)
    fs
  }
}
