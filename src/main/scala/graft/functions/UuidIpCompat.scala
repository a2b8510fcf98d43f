package graft.functions

/** Canonicalization kernels for the two string-emulated reference
  * types (SURVEY §1.3 maps both to Spark STRING):
  *
  *  - UUID (reference `type/UuidOperators.java`, vectors in
  *    `type/TestUuidOperators.java`): `CAST(x AS UUID)` validates the
  *    8-4-4-4-12 hex form and lowercases — so equality/ordering over
  *    the canonical text agrees with the reference's byte order
  *    (lowercase hex is ordered like the bytes it spells).
  *  - IPADDRESS (reference `type/IpAddressOperators.java`, vectors in
  *    `type/TestIpAddressOperators.java`): `CAST(x AS IPADDRESS)`
  *    parses IPv4 / IPv6 text (no DNS — names like 'facebook.com'
  *    raise, matching the reference's INVALID_CAST_ARGUMENT), then
  *    renders the canonical form: IPv4 and IPv4-mapped IPv6
  *    (::ffff:a.b.c.d) as the dotted quad, everything else as RFC
  *    5952 compressed lowercase hex groups (longest zero run — at
  *    least two groups — compressed, leftmost wins).
  *
  * Casts between these types and VARBINARY carry the 16-byte VALUE
  * form in both directions (uuidBytes/ipBytes out, uuidFromBytes/
  * ipFromBytes in). Documented divergence (docs/MIGRATION.md):
  * IPADDRESS ORDERING compares canonical TEXT here, which diverges
  * from the reference's 16-byte order in general (mixed IPv4/IPv6,
  * leading-digit-count within IPv4, unpadded hex groups within IPv6).
  */
object UuidIpCompat {

  private val uuidRe =
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$".r

  /** Validate + lowercase a UUID text (reference UuidOperators cast
    * from varchar: "Invalid UUID string length"/"Cannot cast value").
    */
  def uuidCanon(s: String): String = {
    if (s == null) return null
    if (uuidRe.findFirstIn(s).isEmpty)
      throw new IllegalArgumentException(s"Cannot cast value to UUID: $s")
    s.toLowerCase
  }

  def uuidCanonOrNull(s: String): String =
    try uuidCanon(s) catch { case _: IllegalArgumentException => null }

  /** Parse IPv4/IPv6 text to 16 bytes (IPv4 maps into ::ffff:/96, the
    * reference's storage form). Throws on anything else — including
    * host names, which the reference rejects without resolving. */
  def ipBytes(s: String): Array[Byte] = {
    def fail() = throw new IllegalArgumentException(
      s"Cannot cast value to IPADDRESS: $s")
    def ipv4(t: String): Array[Byte] = {
      val parts = t.split("\\.", -1)
      if (parts.length != 4) fail()
      parts.map { p =>
        // strict like the reference's Guava InetAddresses.forString:
        // no surrounding whitespace (nothing is trimmed here) and no
        // leading-zero octets ('01.2.3.4' is INVALID_CAST_ARGUMENT)
        if (p.isEmpty || p.length > 3 || !p.forall(c => c >= '0' && c <= '9')) fail()
        if (p.length > 1 && p.charAt(0) == '0') fail()
        val v = p.toInt
        if (v > 255) fail()
        v.toByte
      }
    }
    if (!s.contains(':')) {
      val b = new Array[Byte](16)
      b(10) = -1; b(11) = -1
      System.arraycopy(ipv4(s), 0, b, 12, 4)
      return b
    }
    // IPv6: at most one '::'; groups are 1-4 hex digits; the last
    // group may be an embedded dotted IPv4 (two 16-bit groups)
    val dc = s.indexOf("::")
    if (dc >= 0 && s.indexOf("::", dc + 1) >= 0) fail()
    // an embedded dotted IPv4 may only occupy the address's LAST 32
    // bits, so it is legal only as the final group of the final
    // segment (`v4Ok`) — never left of a '::'
    def groups(t: String, v4Ok: Boolean): Seq[Int] = {
      if (t.isEmpty) return Seq.empty
      val parts = t.split(":", -1)
      parts.zipWithIndex.flatMap { case (p, i) =>
        if (p.isEmpty) fail()
        else if (p.contains('.')) {
          if (!v4Ok || i != parts.length - 1) fail()
          val v4 = ipv4(p)
          Seq(((v4(0) & 0xff) << 8) | (v4(1) & 0xff),
            ((v4(2) & 0xff) << 8) | (v4(3) & 0xff))
        } else {
          if (p.length > 4 || !p.forall(c =>
            (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
              (c >= 'A' && c <= 'F'))) fail()
          Seq(Integer.parseInt(p, 16))
        }
      }.toSeq
    }
    val gs: Seq[Int] =
      if (dc < 0) {
        val g = groups(s, v4Ok = true)
        if (g.length != 8) fail()
        g
      } else {
        val left = groups(s.substring(0, dc), v4Ok = false)
        val right = groups(s.substring(dc + 2), v4Ok = true)
        if (left.length + right.length > 7) fail()
        left ++ Seq.fill(8 - left.length - right.length)(0) ++ right
      }
    val b = new Array[Byte](16)
    var i = 0
    while (i < 8) {
      b(2 * i) = ((gs(i) >> 8) & 0xff).toByte
      b(2 * i + 1) = (gs(i) & 0xff).toByte
      i += 1
    }
    b
  }

  /** Render 16 address bytes canonically: dotted quad for
    * IPv4-mapped, RFC 5952 for the rest. */
  def ipRender(b: Array[Byte]): String = {
    val v4mapped = (0 until 10).forall(b(_) == 0) && b(10) == -1 && b(11) == -1
    if (v4mapped)
      return s"${b(12) & 0xff}.${b(13) & 0xff}.${b(14) & 0xff}.${b(15) & 0xff}"
    val gs = (0 until 8).map(i => ((b(2 * i) & 0xff) << 8) | (b(2 * i + 1) & 0xff))
    // longest run of zero groups (>= 2), leftmost on ties (RFC 5952 §4.2.3)
    var bestStart = -1; var bestLen = 0
    var i = 0
    while (i < 8) {
      if (gs(i) == 0) {
        var j = i
        while (j < 8 && gs(j) == 0) j += 1
        if (j - i > bestLen) { bestStart = i; bestLen = j - i }
        i = j
      } else i += 1
    }
    if (bestLen < 2) gs.map(g => Integer.toHexString(g)).mkString(":")
    else {
      val pre = gs.take(bestStart).map(Integer.toHexString)
      val post = gs.drop(bestStart + bestLen).map(Integer.toHexString)
      pre.mkString(":") + "::" + post.mkString(":")
    }
  }

  def ipCanon(s: String): String =
    if (s == null) null else ipRender(ipBytes(s))

  def ipCanonOrNull(s: String): String =
    try ipCanon(s) catch { case _: IllegalArgumentException => null }

  /** VARBINARY → IPADDRESS (reference accepts 4 or 16 bytes). */
  def ipFromBytes(b: Array[Byte]): String = {
    if (b == null) return null
    if (b.length == 4) {
      val full = new Array[Byte](16)
      full(10) = -1; full(11) = -1
      System.arraycopy(b, 0, full, 12, 4)
      ipRender(full)
    } else if (b.length == 16) ipRender(b)
    else throw new IllegalArgumentException(
      s"Invalid IP address binary length: ${b.length}")
  }

  /** UUID text → the 16-byte VALUE form (reference UuidOperators cast
    * to varbinary, vectors in TestUuidOperators.testUUIDToVarbinaryCast).
    * Validates first, so invalid text raises like the cast it lowers. */
  def uuidBytes(s: String): Array[Byte] = {
    if (s == null) return null
    val hex = uuidCanon(s).replace("-", "")
    val b = new Array[Byte](16)
    var i = 0
    while (i < 16) {
      b(i) = ((Character.digit(hex.charAt(2 * i), 16) << 4) |
        Character.digit(hex.charAt(2 * i + 1), 16)).toByte
      i += 1
    }
    b
  }

  /** IPADDRESS text → the 16-byte VALUE form (IPv4 maps into
    * ::ffff:/96 — reference IpAddressOperators cast to varbinary). */
  def ipBytesOrNullIn(s: String): Array[Byte] =
    if (s == null) null else ipBytes(s)

  /** VARBINARY → UUID (reference accepts exactly 16 bytes). */
  def uuidFromBytes(b: Array[Byte]): String = {
    if (b == null) return null
    if (b.length != 16)
      throw new IllegalArgumentException(
        s"Invalid UUID binary length: ${b.length}")
    val hex = b.map(x => f"${x & 0xff}%02x").mkString
    s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-${hex.substring(12, 16)}-" +
      s"${hex.substring(16, 20)}-${hex.substring(20)}"
  }
}
